"""Small dense linear solves in pure jnp.

The TPU backend in this environment implements LuDecomposition only for
f32/c64 — ``jnp.linalg.solve``/``lu_factor`` on f64 operands fail to
compile. The solver's small replicated systems (the 2l x 2l compact-BFGS
matrices, tiny refinement systems) therefore use an explicitly unrolled
Gaussian elimination with partial pivoting built from ops every backend
supports (dynamic row gather/update, elementwise math). Intended for
k <= ~32 (the loop unrolls k times at trace)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_small(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B for small square A (k x k, k unrolled at trace time).

    B may be (k,) or (k, m). Partial pivoting; f64-safe on all backends."""
    single = B.ndim == 1
    Bm = B[:, None] if single else B
    k = A.shape[0]
    M = jnp.concatenate([A, Bm.astype(A.dtype)], axis=1)
    rows = jnp.arange(k)
    for i in range(k):
        col = jnp.abs(M[:, i])
        col = jnp.where(rows >= i, col, -jnp.inf)
        p = jnp.argmax(col)
        row_i, row_p = M[i], M[p]
        M = M.at[i].set(row_p)
        M = M.at[p].set(row_i)
        pivot = M[i, i]
        inv_p = jnp.where(jnp.abs(pivot) > 0, 1.0 / pivot, 0.0)
        factor = M[:, i] * inv_p
        elim = rows > i
        M = M - jnp.where(elim[:, None], factor[:, None] * M[i][None, :], 0.0)
    # back substitution
    for i in reversed(range(k)):
        inv_p = jnp.where(jnp.abs(M[i, i]) > 0, 1.0 / M[i, i], 0.0)
        M = M.at[i].set(M[i] * inv_p)
        above = rows < i
        M = M - jnp.where(above[:, None], M[:, i][:, None] * M[i][None, :], 0.0)
    X = M[:, k:]
    return X[:, 0] if single else X
