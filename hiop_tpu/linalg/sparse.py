"""Triplet (COO) sparse matrices with static structure.

Functional equivalent of ``hiopMatrixSparseTriplet`` (/root/reference/src/
LinAlg/hiopMatrixSparseTriplet.hpp:26): the structure (rows, cols) is fixed
at problem construction (host numpy; the native CSR utilities in
hiop_tpu/native pre-sort/merge it), only the values are device arrays.
Matvecs are static-structure gather/segment-sum kernels — O(nnz), jittable,
shard-friendly — so the solver's residual/KKT paths never materialize an
(m, n) dense Jacobian for large sparse problems.

:class:`TripletMatrix` duck-types the small slice of the jax-array API the
solver uses on Jacobians (``shape``, ``A @ v``, ``A.T @ w``), letting the
generic IPM loop run unchanged in matrix-free mode.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


class TripletMatrix:
    """Static-structure COO matrix with device values."""

    def __init__(self, rows, cols, vals, shape: Tuple[int, int]):
        self.rows = jnp.asarray(np.asarray(rows, dtype=np.int32))
        self.cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
        self.vals = jnp.asarray(vals)
        self.shape = tuple(shape)

    def __matmul__(self, v):
        m, n = self.shape
        if m == 0:
            return jnp.zeros((0,), self.vals.dtype)
        return jax.ops.segment_sum(
            self.vals * jnp.asarray(v)[self.cols], self.rows, num_segments=m
        )

    @property
    def T(self) -> "TransposedTriplet":
        return TransposedTriplet(self)

    def todense(self):
        m, n = self.shape
        return jnp.zeros((m, n), self.vals.dtype).at[self.rows, self.cols].add(self.vals)

    def with_values(self, vals) -> "TripletMatrix":
        out = TripletMatrix.__new__(TripletMatrix)
        out.rows, out.cols, out.vals, out.shape = self.rows, self.cols, jnp.asarray(vals), self.shape
        return out


class TransposedTriplet:
    def __init__(self, base: TripletMatrix):
        self.base = base
        self.shape = (base.shape[1], base.shape[0])

    def __matmul__(self, w):
        m, n = self.base.shape
        if n == 0 or m == 0:
            return jnp.zeros((n,), self.base.vals.dtype)
        return jax.ops.segment_sum(
            self.base.vals * jnp.asarray(w)[self.base.rows],
            self.base.cols,
            num_segments=n,
        )
