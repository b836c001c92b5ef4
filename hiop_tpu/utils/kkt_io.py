"""Per-iteration KKT dumping.

Parity with ``hiopCSR_IO`` (/root/reference/src/Utils/hiopCSR_IO.hpp and the
``write_kkt`` option): the reference writes the KKT matrix/rhs/solution per
iteration in its ``.iajaaa`` text format (documented in
src/LinAlg/csr_iajaaa.md) for offline analysis. Here the operands are saved
as ``.npz`` (KKT operands are dense/blocked jax arrays on TPU); one file per
iteration: ``<prefix>_kkt_iter<N>.npz``.
"""

from __future__ import annotations

import numpy as np


def dump_kkt(prefix: str, iter_num: int, **arrays) -> str:
    path = f"{prefix}_kkt_iter{iter_num}.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items() if v is not None})
    return path
