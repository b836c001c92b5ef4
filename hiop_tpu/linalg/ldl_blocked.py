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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128
_MAX_VMEM_ELEMS = 2048 * 2048  # matches linalg/cholesky.py


class LdlFactors(NamedTuple):
    L: jax.Array       # (n_p, n_p) unit-lower factor (padded)
    d: jax.Array       # (n_p,) pivots (padding pivots are +1)
    n: int             # true (unpadded) dimension
    n_neg: jax.Array   # count of negative pivots among the first n
    ok: jax.Array      # bool: finite factor, no pivot breakdown


def _ldl_diag_block(S):
    """Unblocked no-pivot LDL^T of a (B, B) block.

    Returns (unit-lower L, d). A zero pivot produces d=0 and a zeroed
    column; the caller detects breakdown via the pivot magnitudes.

    Implementation note: Mosaic (Pallas TPU) cannot lower dynamic_slice /
    dynamic_update_slice of VALUES at traced offsets, so every per-column
    read/write is a masked full-block op (iota comparisons against the
    traced loop index ARE supported); this also keeps the XLA path
    fusion-friendly."""
    B = S.shape[0]
    dt = S.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def body(j, carry):
        S, L, d = carry
        dj = jnp.sum(jnp.where((rows == j) & (cols == j), S, 0.0))
        inv = jnp.where(jnp.abs(dj) > 0, 1.0 / jnp.where(dj == 0, 1.0, dj), 0.0)
        col = jnp.sum(jnp.where(cols == j, S, 0.0), axis=1)
        lcol = jnp.where(row_ids > j, col * inv, 0.0)
        ecol = (row_ids == j).astype(dt)
        L = jnp.where(cols == j, (lcol + ecol)[:, None], L)
        S = S - dj * (lcol[:, None] * lcol[None, :])
        d = jnp.where(row_ids == j, dj, d)
        return S, L, d

    L = jnp.zeros((B, B), dt)
    d = jnp.zeros((B,), dt)
    _, L, d = jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body, (S, L, d))
    return L, d


def _unit_lower_inverse(L):
    """Inverse of a (B, B) unit-lower matrix by forward substitution.
    Masked full-block ops for the same Mosaic reason as above."""
    B = L.shape[0]
    dt = L.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def body(i, X):
        Li = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0)
        Li_strict = jnp.where(col_ids < i, Li, 0.0)
        # (1,B)@(B,B): Mosaic cannot lower a rank-1 vec@mat contraction
        acc = jnp.dot(
            Li_strict[None, :], X, precision=jax.lax.Precision.HIGHEST
        )[0]
        e_i = (col_ids == i).astype(dt)
        row = e_i - acc
        return jnp.where(rows == i, row[None, :], X)

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body, jnp.zeros((B, B), dt))


def _pad_sym(M, n_p):
    """Embed M into blkdiag(M, I_{n_p-n}) — extra pivots come out as +1."""
    n = M.shape[0]
    if n_p == n:
        return M
    P = jnp.zeros((n_p, n_p), M.dtype)
    P = P.at[:n, :n].set(M)
    idx = jnp.arange(n, n_p)
    return P.at[idx, idx].set(1.0)


def _ldl_panel_math(Akk, Acol, LD, Lk, LDk):
    """The block-column algebra shared by the XLA loop and the Pallas
    kernel (only the tile reads/writes differ between them): factor the
    updated diagonal block and form the scaled trailing panel.

    Returns (Lkk, dk, P) with P = (Acol - LD Lk^T) Lkk^{-T} diag(dk)^{-1}."""
    dt = Akk.dtype
    # explicit full-f32 precision: at the TPU default (one bf16 pass) the
    # trailing updates destroy the pivots — measured 1e5x factor error and a
    # wrong inertia count on a cond=1e5 saddle matrix
    hp = jax.lax.Precision.HIGHEST
    S = Akk - jnp.dot(LDk, Lk.T, preferred_element_type=dt, precision=hp)
    Lkk, dk = _ldl_diag_block(S)
    Lkk_inv = _unit_lower_inverse(Lkk)
    W = Acol - jnp.dot(LD, Lk.T, preferred_element_type=dt, precision=hp)
    inv_d = jnp.where(jnp.abs(dk) > 0, 1.0 / jnp.where(dk == 0, 1.0, dk), 0.0)
    P = jnp.dot(W, Lkk_inv.T, preferred_element_type=dt, precision=hp) * inv_d[None, :]
    return Lkk, dk, P


def _block_col_update(A, L, d, k, col_ids_full, row_ids_colblk):
    """One right-looking block-column step of the XLA path: returns
    (colblock, dk) for column block k, given the already-factorized
    columns masked into L (scaled by d)."""
    n_p = A.shape[0]
    B = _BLOCK
    dt = A.dtype
    kB = k * B
    Lmask = jnp.where(col_ids_full < kB, L, 0.0)          # (n_p, n_p)
    LD = Lmask * d[None, :]                               # cols scaled by d
    Lk = jax.lax.dynamic_slice(Lmask, (kB, 0), (B, n_p))  # (B, n_p)
    LDk = jax.lax.dynamic_slice(LD, (kB, 0), (B, n_p))
    Akk = jax.lax.dynamic_slice(A, (kB, kB), (B, B))
    Acol = jax.lax.dynamic_slice(A, (0, kB), (n_p, B))    # (n_p, B)
    Lkk, dk, P = _ldl_panel_math(Akk, Acol, LD, Lk, LDk)

    in_block = (row_ids_colblk >= kB) & (row_ids_colblk < kB + B)
    below = row_ids_colblk >= kB + B
    Lpad = jnp.zeros((n_p, B), dt)
    Lpad = jax.lax.dynamic_update_slice(Lpad, Lkk, (kB, 0))
    colblock = jnp.where(in_block, Lpad, jnp.where(below, P, 0.0))
    return colblock, dk


def _ldl_kernel(a_ref, o_ref, d_ref):
    """Pallas kernel: the whole matrix lives in VMEM (one whole-array
    block spec); o_ref holds original-A columns on the right of the
    factorization frontier and finished L columns on its left, like the
    Pallas Cholesky (linalg/cholesky.py). All dynamic indexing goes
    through pl.ds on the refs (Mosaic cannot slice values at traced
    offsets); done-column selection is by iota masks."""
    n = a_ref.shape[0]
    B = _BLOCK
    nb = n // B
    dt = a_ref.dtype
    o_ref[:] = a_ref[:]
    d_ref[:] = jnp.zeros((1, n), dt)
    col_ids_full = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    col_ids_row = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    row_ids_colblk = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)

    def block_step(k, _):
        kB = k * B
        M = o_ref[:]
        dvec = d_ref[:][0]
        Lmask = jnp.where(col_ids_full < kB, M, 0.0)          # done columns
        LD = Lmask * dvec[None, :]
        Lk = jnp.where(col_ids_row < kB, o_ref[pl.ds(kB, B), :], 0.0)  # (B, n)
        LDk = Lk * dvec[None, :]
        Akk = o_ref[pl.ds(kB, B), pl.ds(kB, B)]
        Acol = o_ref[:, pl.ds(kB, B)]                          # (n, B)
        Lkk, dk, P = _ldl_panel_math(Akk, Acol, LD, Lk, LDk)

        below = row_ids_colblk >= kB + B
        o_ref[:, pl.ds(kB, B)] = jnp.where(below, P, 0.0)
        o_ref[pl.ds(kB, B), pl.ds(kB, B)] = Lkk
        d_ref[:, pl.ds(kB, B)] = dk[None, :]
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), block_step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_ldl(A: jax.Array, interpret: bool = False):
    """(L, d) of already-padded A (n % 128 == 0, VMEM-sized) via the Pallas
    kernel; callers dispatch through :func:`ldl_factor`."""
    n = A.shape[0]
    assert n % _BLOCK == 0, "pallas_ldl requires n divisible by 128"
    L, d = pl.pallas_call(
        _ldl_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(A.shape, A.dtype),
            jax.ShapeDtypeStruct((1, n), A.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(A)
    return L, d[0]


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def _ldl_factor_impl(M: jax.Array, use_pallas: bool, interpret: bool) -> LdlFactors:
    n = M.shape[0]
    B = _BLOCK
    n_p = max(((n + B - 1) // B) * B, B)
    A = _pad_sym(M, n_p)
    dt = A.dtype
    nb = n_p // B

    if use_pallas:
        L, d = pallas_ldl(A, interpret=interpret)
    else:
        col_ids_full = jax.lax.broadcasted_iota(jnp.int32, (n_p, n_p), 1)
        row_ids_colblk = jax.lax.broadcasted_iota(jnp.int32, (n_p, B), 0)

        def block_step(k, carry):
            L, d = carry
            colblock, dk = _block_col_update(
                A, L, d, k, col_ids_full, row_ids_colblk
            )
            L = jax.lax.dynamic_update_slice(L, colblock, (0, k * B))
            d = jax.lax.dynamic_update_slice(d, dk, (k * B,))
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


def ldl_factor(M: jax.Array) -> LdlFactors:
    """Blocked no-pivot LDL^T of symmetric M. Any square f32/f64 matrix;
    internally padded to a multiple of 128. Dispatches between the XLA
    fori_loop implementation and the Pallas kernel on the exec_policies
    backend (set via linalg.cholesky.set_backend, the ExecSpace axis)."""
    from hiop_tpu.linalg import cholesky as _chol_mod

    n = M.shape[0]
    n_p = max(((n + _BLOCK - 1) // _BLOCK) * _BLOCK, _BLOCK)
    if (
        _chol_mod._BACKEND == "pallas"
        # input + output matrix buffers both live in VMEM -> budget 2x
        and 2 * n_p * n_p <= _MAX_VMEM_ELEMS
        # Mosaic has no f64 support; Pallas serves the f32/bf16 tiers
        and M.dtype in (jnp.float32, jnp.bfloat16)
    ):
        from hiop_tpu.backends.execspace import on_accelerator

        return _ldl_factor_impl(M, True, not on_accelerator())
    return _ldl_factor_impl(M, False, False)


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
