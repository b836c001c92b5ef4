"""Blocked no-pivot LDL^T factorization on device (MXU-friendly).

TPU-native analogue of the reference's MAGMA no-pivoting symmetric-indefinite
GPU factorization (``hiopLinSolverSymDenseMagmaNopiv``,
/root/reference/src/LinAlg/hiopLinSolverSymDenseMagma.hpp:145): about twice
as fast as pivoted LDL^T but numerically less stable, used inside the IPM's
regularization ladder where breakdowns simply trigger a retry with larger
perturbations. Like the reference's solver it computes the inertia on
device from the factor (D's signs, valid by Sylvester's law of inertia
whenever the factorization completes without breakdown).

Design (static shapes, single XLA program):

- the matrix is padded to a multiple of the 128 MXU tile with an identity
  block (extra pivots are +1 and excluded from the inertia count);
- a ``fori_loop`` walks 128-wide block columns right-looking: the diagonal
  block is factorized by an in-register no-pivot Crout loop, its unit-lower
  inverse is built by forward substitution, and the trailing panel update is
  one (n,128)x(128,128) matmul — all FLOPs land on the MXU;
- prior columns enter through masked full-width matmuls (a column mask
  replaces dynamic-extent slicing, which XLA cannot tile well).

Solve = unit-lower triangular solve, diagonal scale, unit-upper solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BLOCK = 128


class LdlFactors(NamedTuple):
    L: jax.Array       # (n_p, n_p) unit-lower factor (padded)
    d: jax.Array       # (n_p,) pivots (padding pivots are +1)
    n: int             # true (unpadded) dimension
    n_neg: jax.Array   # count of negative pivots among the first n
    ok: jax.Array      # bool: finite factor, no pivot breakdown


def _ldl_diag_block(S):
    """Unblocked no-pivot LDL^T of a (B, B) block.

    Returns (unit-lower L, d). A zero pivot produces d=0 and a zeroed
    column; the caller detects breakdown via the pivot magnitudes."""
    B = S.shape[0]
    dt = S.dtype
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def body(j, carry):
        S, L, d = carry
        dj = jax.lax.dynamic_slice(S, (j, j), (1, 1))[0, 0]
        inv = jnp.where(jnp.abs(dj) > 0, 1.0 / jnp.where(dj == 0, 1.0, dj), 0.0)
        col = jax.lax.dynamic_slice(S, (0, j), (B, 1))[:, 0]
        lcol = jnp.where(row_ids > j, col * inv, 0.0)
        ecol = (row_ids == j).astype(dt)
        L = jax.lax.dynamic_update_slice(L, (lcol + ecol)[:, None], (0, j))
        S = S - dj * (lcol[:, None] * lcol[None, :])
        d = jax.lax.dynamic_update_slice(d, dj[None], (j,))
        return S, L, d

    L = jnp.zeros((B, B), dt)
    d = jnp.zeros((B,), dt)
    _, L, d = jax.lax.fori_loop(0, B, body, (S, L, d))
    return L, d


def _unit_lower_inverse(L):
    """Inverse of a (B, B) unit-lower matrix by forward substitution."""
    B = L.shape[0]
    dt = L.dtype
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def body(i, X):
        Li = jax.lax.dynamic_slice(L, (i, 0), (1, B))[0]
        Li_strict = jnp.where(col_ids < i, Li, 0.0)
        acc = Li_strict @ X
        e_i = (col_ids == i).astype(dt)
        row = e_i - acc
        return jax.lax.dynamic_update_slice(X, row[None, :], (i, 0))

    return jax.lax.fori_loop(0, B, body, jnp.zeros((B, B), dt))


def _pad_sym(M, n_p):
    """Embed M into blkdiag(M, I_{n_p-n}) — extra pivots come out as +1."""
    n = M.shape[0]
    if n_p == n:
        return M
    P = jnp.zeros((n_p, n_p), M.dtype)
    P = P.at[:n, :n].set(M)
    idx = jnp.arange(n, n_p)
    return P.at[idx, idx].set(1.0)


@jax.jit
def ldl_factor(M: jax.Array) -> LdlFactors:
    """Blocked no-pivot LDL^T of symmetric M. Any square f32/f64 matrix;
    internally padded to a multiple of 128."""
    n = M.shape[0]
    B = _BLOCK
    n_p = max(((n + B - 1) // B) * B, B)
    A = _pad_sym(M, n_p)
    dt = A.dtype
    nb = n_p // B
    col_ids_full = jax.lax.broadcasted_iota(jnp.int32, (n_p, n_p), 1)
    row_ids_colblk = jax.lax.broadcasted_iota(jnp.int32, (n_p, B), 0)

    def block_step(k, carry):
        L, d = carry
        kB = k * B
        Lmask = jnp.where(col_ids_full < kB, L, 0.0)          # (n_p, n_p)
        LD = Lmask * d[None, :]                               # cols scaled by d
        Lk = jax.lax.dynamic_slice(Lmask, (kB, 0), (B, n_p))  # (B, n_p)
        LDk = jax.lax.dynamic_slice(LD, (kB, 0), (B, n_p))
        Akk = jax.lax.dynamic_slice(A, (kB, kB), (B, B))
        S = Akk - jnp.dot(LDk, Lk.T, preferred_element_type=dt)
        Lkk, dk = _ldl_diag_block(S)
        Lkk_inv = _unit_lower_inverse(Lkk)

        Acol = jax.lax.dynamic_slice(A, (0, kB), (n_p, B))    # (n_p, B)
        W = Acol - jnp.dot(LD, Lk.T, preferred_element_type=dt)
        inv_d = jnp.where(jnp.abs(dk) > 0, 1.0 / jnp.where(dk == 0, 1.0, dk), 0.0)
        P = jnp.dot(W, Lkk_inv.T, preferred_element_type=dt) * inv_d[None, :]

        in_block = (row_ids_colblk >= kB) & (row_ids_colblk < kB + B)
        below = row_ids_colblk >= kB + B
        Lpad = jnp.zeros((n_p, B), dt)
        Lpad = jax.lax.dynamic_update_slice(Lpad, Lkk, (kB, 0))
        colblock = jnp.where(in_block, Lpad, jnp.where(below, P, 0.0))
        L = jax.lax.dynamic_update_slice(L, colblock, (0, kB))
        d = jax.lax.dynamic_update_slice(d, dk, (kB,))
        return L, d

    L0 = jnp.zeros((n_p, n_p), dt)
    d0 = jnp.zeros((n_p,), dt)
    L, d = jax.lax.fori_loop(0, nb, block_step, (L0, d0))

    true_mask = jnp.arange(n_p) < n
    d_true = jnp.where(true_mask, d, 1.0)
    # breakdown: pivots tiny relative to the matrix scale, or non-finite
    # factor — either way the factorization carries no usable information
    scale = jnp.maximum(jnp.max(jnp.abs(M)), 1.0)
    tiny = jnp.finfo(dt).eps * scale * 1e-2
    ok = (
        jnp.all(jnp.isfinite(L))
        & jnp.all(jnp.isfinite(d))
        & jnp.all(jnp.abs(d_true) > tiny)
    )
    n_neg = jnp.sum((d < 0) & true_mask)
    return LdlFactors(L, d, n, n_neg, ok)


@jax.jit
def ldl_solve(f: LdlFactors, rhs: jax.Array) -> jax.Array:
    """Solve M x = rhs with the factors. rhs is (n,) or (n, k)."""
    n_p = f.L.shape[0]
    squeeze = rhs.ndim == 1
    r = rhs[:, None] if squeeze else rhs
    pad = n_p - r.shape[0]
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, r.shape[1]), r.dtype)], axis=0)
    y = jax.scipy.linalg.solve_triangular(f.L, r, lower=True, unit_diagonal=True)
    inv_d = jnp.where(jnp.abs(f.d) > 0, 1.0 / jnp.where(f.d == 0, 1.0, f.d), 0.0)
    z = y * inv_d[:, None]
    x = jax.scipy.linalg.solve_triangular(
        f.L.T, z, lower=False, unit_diagonal=True
    )
    x = x[: rhs.shape[0]]
    return x[:, 0] if squeeze else x
