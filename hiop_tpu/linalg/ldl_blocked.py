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
- the XLA lane walks 128-wide block columns right-looking in an UNROLLED
  Python loop over panels, carrying an explicitly shrinking trailing
  submatrix: every step factorizes the 128x128 diagonal block with a fused
  Crout+inverse register loop, forms the scaled panel with one
  (r,128)x(128,128) matmul, and applies one (r,128)x(128,r) rank-128
  trailing update — static shapes per step (the loop is unrolled at trace
  time), executed FLOPs = n^3/3 + O(n^2), all on the MXU. This replaced a
  ``fori_loop`` over masked full-width updates that executed ~3x the FLOPs
  with no shrinking frontier (measured 163 ms at 4710^2 f32 vs 36.8 ms for
  XLA's own potrf at 4608^2);
- the Pallas lane (whole-matrix VMEM, <=2048^2) keeps the masked
  full-width formulation because Mosaic cannot slice values at traced
  offsets.

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


def _ldl_diag_block_inv(S):
    """Fused no-pivot LDL^T + unit-lower inverse of a (B, B) block.

    Returns (L, d, Linv) in ONE register loop: at Crout step j column j of
    L is final, so the inverse accumulates as X := X - l_j (e_j^T X)
    (X = E_{B-1}^{-1} ... E_0^{-1} = L^{-1} with E_j = I + l_j e_j^T) —
    halving the sequential depth vs a separate forward-substitution loop.
    Masked full-block ops for the same Mosaic/XLA-fusion reasons as
    :func:`_ldl_diag_block`."""
    B = S.shape[0]
    dt = S.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def body(j, carry):
        S, L, d, X = carry
        dj = jnp.sum(jnp.where((rows == j) & (cols == j), S, 0.0))
        inv = jnp.where(jnp.abs(dj) > 0, 1.0 / jnp.where(dj == 0, 1.0, dj), 0.0)
        col = jnp.sum(jnp.where(cols == j, S, 0.0), axis=1)
        lcol = jnp.where(row_ids > j, col * inv, 0.0)
        ecol = (row_ids == j).astype(dt)
        L = jnp.where(cols == j, (lcol + ecol)[:, None], L)
        S = S - dj * (lcol[:, None] * lcol[None, :])
        d = jnp.where(row_ids == j, dj, d)
        xrow = jnp.sum(jnp.where(rows == j, X, 0.0), axis=0)
        X = X - lcol[:, None] * xrow[None, :]
        return S, L, d, X

    L = jnp.zeros((B, B), dt)
    d = jnp.zeros((B,), dt)
    X = jnp.eye(B, dtype=dt)
    _, L, d, X = jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body, (S, L, d, X))
    return L, d, X


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


def _ldl_xla_unrolled(A):
    """Right-looking blocked LDL^T with a SHRINKING trailing frontier,
    unrolled over 128-wide panels at trace time (static shapes per step).
    Executed FLOPs = sum_k r_k^2 * 128 ~= n^3/3 — the roofline-correct
    count, vs ~n^3 for the old masked full-width fori_loop formulation.
    Returns (L, d) of the padded matrix."""
    n_p = A.shape[0]
    B = _BLOCK
    nb = n_p // B
    dt = A.dtype
    hp = jax.lax.Precision.HIGHEST
    L = jnp.zeros((n_p, n_p), dt)
    d = jnp.zeros((n_p,), dt)
    T = A
    for k in range(nb):
        Lkk, dk, Lkk_inv = _ldl_diag_block_inv(T[:B, :B])
        inv_d = jnp.where(jnp.abs(dk) > 0, 1.0 / jnp.where(dk == 0, 1.0, dk), 0.0)
        r = n_p - (k + 1) * B
        if r:
            P = (
                jnp.dot(T[B:, :B], Lkk_inv.T, preferred_element_type=dt,
                        precision=hp)
                * inv_d[None, :]
            )
            col = jnp.concatenate([Lkk, P], axis=0)
            T = T[B:, B:] - jnp.dot(
                P * dk[None, :], P.T, preferred_element_type=dt, precision=hp
            )
        else:
            col = Lkk
        L = jax.lax.dynamic_update_slice(L, col, (k * B, k * B))
        d = jax.lax.dynamic_update_slice(d, dk, (k * B,))
    return L, d


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

    if use_pallas:
        L, d = pallas_ldl(A, interpret=interpret)
    else:
        L, d = _ldl_xla_unrolled(A)

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
