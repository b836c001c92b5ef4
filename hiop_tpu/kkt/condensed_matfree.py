"""Matrix-free condensed KKT for large sparse NLPs.

The dense condensed path (kkt/condensed.py) materializes
K = H + Dx + Jd^T Dd Jd as an (n, n) array — right for moderate n, O(n^2)
memory beyond. This module keeps everything in triplet form and solves the
SPD condensed system with Jacobi-preconditioned conjugate gradient, the
TPU-native analogue of the reference's Krylov-based inner solves
(hiopKrylovSolver + the ReSolve FGMRES machinery, SURVEY.md §2.4):

  K v = H v + (Dx + delta_wx) v + Jd^T (Dd_tilde (Jd v))

with all sparse matvecs as static-structure gather/segment-sum kernels —
no scatter-heavy assembly, O(nnz) per application, fully jit/shard-friendly.
Nonconvexity surfaces as a CG breakdown (p^T K p <= 0), which the strategy
treats exactly like a failed Cholesky: bump delta_w and retry.

Selected via ``linear_solver_sparse`` in {'cg'} (or 'auto' with large n)
when ``KKTLinsys=condensed``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class SparseOps(NamedTuple):
    """Static triplet structure for J_d (ineq Jacobian) and the
    upper-triangle Hessian, with everything needed for matvecs."""

    jd_rows: jax.Array   # (nnz_j,)
    jd_cols: jax.Array
    h_rows: jax.Array    # (nnz_h,) upper triangle
    h_cols: jax.Array
    n: int
    m_ineq: int


def build_ops(jd_rows, jd_cols, h_rows, h_cols, n, m_ineq) -> SparseOps:
    return SparseOps(
        jd_rows=jnp.asarray(np.asarray(jd_rows)),
        jd_cols=jnp.asarray(np.asarray(jd_cols)),
        h_rows=jnp.asarray(np.asarray(h_rows)),
        h_cols=jnp.asarray(np.asarray(h_cols)),
        n=int(n),
        m_ineq=int(m_ineq),
    )


def jd_times_vec(ops: SparseOps, jd_vals, v):
    """J_d @ v via segment-sum over rows."""
    return jax.ops.segment_sum(
        jd_vals * v[ops.jd_cols], ops.jd_rows, num_segments=ops.m_ineq
    )


def jd_trans_times_vec(ops: SparseOps, jd_vals, w):
    """J_d^T @ w via segment-sum over columns."""
    return jax.ops.segment_sum(
        jd_vals * w[ops.jd_rows], ops.jd_cols, num_segments=ops.n
    )


def hess_times_vec(ops: SparseOps, h_vals, v):
    """Symmetric H @ v from upper-triangle triplets."""
    up = jax.ops.segment_sum(h_vals * v[ops.h_cols], ops.h_rows, num_segments=ops.n)
    lo = jax.ops.segment_sum(h_vals * v[ops.h_rows], ops.h_cols, num_segments=ops.n)
    diag_mask = (ops.h_rows == ops.h_cols).astype(h_vals.dtype)
    diag = jax.ops.segment_sum(
        diag_mask * h_vals * v[ops.h_rows], ops.h_rows, num_segments=ops.n
    )
    return up + lo - diag


def condensed_diag(ops: SparseOps, h_vals, jd_vals, Dx, dd_tilde, delta_wx):
    """diag(K) for the Jacobi preconditioner."""
    diag_mask = (ops.h_rows == ops.h_cols).astype(h_vals.dtype)
    h_diag = jax.ops.segment_sum(diag_mask * h_vals, ops.h_rows, num_segments=ops.n)
    jtj_diag = jax.ops.segment_sum(
        dd_tilde[ops.jd_rows] * jd_vals * jd_vals, ops.jd_cols, num_segments=ops.n
    )
    return h_diag + Dx + delta_wx + jtj_diag


def make_cg_solver(ops: SparseOps, maxit: int = 200):
    """Build a jitted PCG solver over the static triplet structure.

    Returns solve(h_vals, jd_vals, Dx, Dd, rx_t, rd_t, ryd, delta_wx,
    delta_wd, delta_cd, tol) -> (dx, dd, dyd, (converged, neg_curv, iters,
    resid_norm)). The structure arrays are closed over (jit constants)."""

    @jax.jit
    def solve(h_vals, jd_vals, Dx, Dd, rx_t, rd_t, ryd,
              delta_wx, delta_wd, delta_cd, tol):
        dd_tot = Dd + delta_wd
        T = 1.0 / (1.0 + delta_cd * dd_tot)
        dd_tilde = dd_tot * T

        def K(v):
            return (
                hess_times_vec(ops, h_vals, v)
                + (Dx + delta_wx) * v
                + jd_trans_times_vec(ops, jd_vals, dd_tilde * jd_times_vec(ops, jd_vals, v))
            )

        rhs = rx_t + jd_trans_times_vec(
            ops, jd_vals, dd_tilde * (ryd - delta_cd * rd_t) + rd_t
        )
        dK = condensed_diag(ops, h_vals, jd_vals, Dx, dd_tilde, delta_wx)
        m_inv = jnp.where(dK > 0, 1.0 / jnp.maximum(dK, 1e-300), 1.0)

        b_norm = jnp.linalg.norm(rhs)
        stop = tol * jnp.maximum(b_norm, 1e-300)

        def cond(carry):
            x, r, z, p, rz, it, neg, done = carry
            return (~done) & (it < maxit)

        def body(carry):
            x, r, z, p, rz, it, neg, done = carry
            Kp = K(p)
            pKp = p @ Kp
            neg_now = pKp <= 0
            alpha = jnp.where(neg_now, 0.0, rz / jnp.where(pKp == 0, 1.0, pKp))
            x = x + alpha * p
            r = r - alpha * Kp
            z = m_inv * r
            rz_new = r @ z
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            done_now = (jnp.linalg.norm(r) <= stop) | neg_now
            return (x, r, z, p, rz_new, it + 1, neg | neg_now, done_now)

        x0 = jnp.zeros_like(rhs)
        z0 = m_inv * rhs
        carry = (x0, rhs, z0, z0, rhs @ z0, jnp.asarray(0), jnp.asarray(False), jnp.asarray(False))
        x, r, z, p, rz, iters, neg, done = jax.lax.while_loop(cond, body, carry)
        resid = jnp.linalg.norm(r)
        converged = (resid <= stop) & ~neg

        dx = x
        dd = T * (jd_times_vec(ops, jd_vals, dx) - ryd + delta_cd * rd_t)
        dyd = dd_tot * dd - rd_t
        return dx, dd, dyd, (converged, neg, iters, resid)

    return solve
