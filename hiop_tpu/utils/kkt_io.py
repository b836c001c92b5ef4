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


def write_iajaaa(path: str, A, rhs=None, sol=None) -> str:
    """Write a matrix (+ optional rhs/solution vectors) in the reference's
    ``.iajaaa`` sparse text format (documented in
    /root/reference/src/LinAlg/csr_iajaaa.md): n, nnz, the n+1 row pointers
    (1-based), the nnz column indices (1-based), the nnz values, then any
    number of n-vectors. Dense input is converted; explicit zeros dropped."""
    A = np.asarray(A)
    n = A.shape[0]
    rows, cols = np.nonzero(A)
    vals = A[rows, cols]
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    with open(path, "w") as f:
        f.write(f"{n}\n{vals.size}\n")
        f.write("\n".join(str(int(p) + 1) for p in row_ptr) + "\n")
        f.write("\n".join(str(int(c) + 1) for c in cols) + "\n")
        f.write("\n".join(repr(float(v)) for v in vals) + "\n")
        for vec in (rhs, sol):
            if vec is not None:
                f.write("\n".join(repr(float(v)) for v in np.asarray(vec)) + "\n")
    return path


def read_iajaaa(path: str):
    """Read an .iajaaa file back; returns (A_dense, vectors list)."""
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    n = int(next(it))
    nnz = int(next(it))
    row_ptr = np.array([int(next(it)) - 1 for _ in range(n + 1)])
    cols = np.array([int(next(it)) - 1 for _ in range(nnz)])
    vals = np.array([float(next(it)) for _ in range(nnz)])
    A = np.zeros((n, n))
    rows = np.repeat(np.arange(n), np.diff(row_ptr))
    A[rows, cols] = vals
    rest = [float(t) for t in it]
    vecs = [np.asarray(rest[i:i + n]) for i in range(0, len(rest), n)]
    return A, vecs
