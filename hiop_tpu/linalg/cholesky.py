"""Pallas blocked Cholesky for the dense KKT factorizations.

The dense-block factorizations (KKT quick path, MDS dense block, Schur
complements) are the hot ops of the Newton solver (SURVEY.md §3.1). This
module provides a TPU Pallas right-looking blocked Cholesky as an
alternative backend to XLA's ``jnp.linalg.cholesky`` — selectable via the
``exec_policies`` option ('pallas' vs 'xla'), mirroring the reference's
exec-policy axis (ExecSpace.hpp:346) where the same operation dispatches to
Seq/RAJA-OMP/CUDA backends.

Kernel design (see /opt/skills/guides/pallas_guide.md):
- the matrix is VMEM-resident (one block spec, no grid) — sized for the
  n_d x n_d dense blocks of MDS problems (<= 1024 f64 / 2048 f32);
- a fori_loop walks block columns of width 128 (the MXU tile);
- panel updates are full-width masked matmuls (static shapes; the mask
  replaces dynamic-extent slices, which Pallas cannot express);
- the 128x128 diagonal block is factorized with an in-register
  Cholesky-Crout loop and its inverse accumulated by forward substitution,
  so the trailing column block is one (n,128)x(128,128) MXU matmul.

``cholesky()`` dispatches between the Pallas kernel and XLA based on the
configured backend, falling back for unsupported sizes. The factor is a
standard lower-triangular matrix usable with jax.scipy cho_solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128
_MAX_VMEM_ELEMS = 2048 * 2048  # f32: 16 MB


def _factor_diag_block(S):
    """In-register Cholesky-Crout of a (B, B) block + its inverse.

    Returns (L, L_inv), both lower triangular. All per-column reads and
    writes are masked full-block ops: Mosaic (Pallas TPU) cannot lower
    dynamic_slice / dynamic_update_slice of VALUES at traced offsets,
    while iota comparisons against the traced loop index lower fine."""
    B = S.shape[0]
    dt = S.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def col_body(j, carry):
        S, L = carry
        sjj = jnp.sum(jnp.where((rows == j) & (cols == j), S, 0.0))
        d = jnp.sqrt(jnp.maximum(sjj, jnp.asarray(0.0, dt)))
        inv_d = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
        col = jnp.sum(jnp.where(cols == j, S, 0.0), axis=1) * inv_d   # (B,)
        col = jnp.where(row_ids >= j, col, 0.0)
        L = jnp.where(cols == j, col[:, None], L)
        S = S - col[:, None] * col[None, :]
        return S, L

    L = jnp.zeros((B, B), dt)
    _, L = jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), col_body, (S, L))

    # forward substitution for L_inv: row i of X solves L[i,:i] X[:i] + L[i,i] X[i] = I[i]
    def inv_body(i, X):
        Li = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0)            # (B,)
        Li_strict = jnp.where(row_ids < i, Li, 0.0)
        # (1,B)@(B,B): Mosaic cannot lower a rank-1 vec@mat contraction
        acc = jnp.dot(
            Li_strict[None, :], X, precision=jax.lax.Precision.HIGHEST
        )[0]                                                          # (B,)
        e_i = (row_ids == i).astype(dt)
        diag = jnp.sum(jnp.where((rows == i) & (cols == i), L, 0.0))
        inv_d = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
        row = (e_i - acc) * inv_d
        return jnp.where(rows == i, row[None, :], X)

    X = jnp.zeros((B, B), dt)
    X = jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), inv_body, X)
    return L, X


def _chol_kernel(a_ref, o_ref):
    n = a_ref.shape[0]
    B = _BLOCK
    nb = n // B
    dt = a_ref.dtype
    o_ref[:] = a_ref[:]
    col_ids_full = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    col_ids_row = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    row_ids_colblk = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)

    def block_step(k, _):
        kB = k * B
        M = o_ref[:]                                               # (n, n)
        Lmask = jnp.where(col_ids_full < kB, M, 0.0)               # done columns
        Lk = jnp.where(col_ids_row < kB, o_ref[pl.ds(kB, B), :], 0.0)  # (B, n)
        Akk = o_ref[pl.ds(kB, B), pl.ds(kB, B)]
        # full-f32 panel updates: the TPU default (one bf16 pass) loses the
        # trailing Schur updates' precision and breaks ill-conditioned factors
        hp = jax.lax.Precision.HIGHEST
        S = Akk - jnp.dot(Lk, Lk.T, preferred_element_type=dt, precision=hp)
        L, Linv = _factor_diag_block(S)

        Acol = o_ref[:, pl.ds(kB, B)]                              # (n, B)
        W = Acol - jnp.dot(Lmask, Lk.T, preferred_element_type=dt, precision=hp)
        P = jnp.dot(W, Linv.T, preferred_element_type=dt, precision=hp)  # (n, B)

        below = row_ids_colblk >= kB + B
        o_ref[:, pl.ds(kB, B)] = jnp.where(below, P, 0.0)
        o_ref[pl.ds(kB, B), pl.ds(kB, B)] = L
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), block_step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cholesky(A: jax.Array, interpret: bool = False) -> jax.Array:
    """Lower Cholesky factor of SPD A via the Pallas kernel. Requires
    n % 128 == 0 and the matrix to fit VMEM; callers should dispatch
    through :func:`cholesky`."""
    n = A.shape[0]
    assert n % _BLOCK == 0, "pallas_cholesky requires n divisible by 128"
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)


_BACKEND = "xla"  # set from the exec_policies option by the solver


def set_backend(name: str) -> None:
    """Select 'xla' or 'pallas'. The dispatch happens at trace time inside
    jitted KKT factorizations, so switching clears jax's jit caches to force
    retracing."""
    global _BACKEND
    if name != _BACKEND:
        _BACKEND = name
        jax.clear_caches()


def cholesky(A: jax.Array) -> jax.Array:
    """Backend-dispatched lower Cholesky (LinearAlgebraFactory analogue)."""
    n = A.shape[0]
    if (
        _BACKEND == "pallas"
        and n % _BLOCK == 0
        # both the input and the output whole-matrix buffers are pinned in
        # VMEM simultaneously -> budget 2x one buffer
        and 2 * n * n <= _MAX_VMEM_ELEMS
        # Mosaic has no f64 support (TPU f64 is emulated); the Pallas path
        # serves the f32/bf16 mixed-precision factorizations
        and A.dtype in (jnp.float32, jnp.bfloat16)
    ):
        from hiop_tpu.backends.execspace import on_accelerator

        return pallas_cholesky(A, interpret=not on_accelerator())
    return jnp.linalg.cholesky(A)
