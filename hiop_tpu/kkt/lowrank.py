"""KKT solve for the quasi-Newton path (low-rank Hessian).

Parity with ``hiopKKTLinSysLowRank`` (/root/reference/src/Optimization/
hiopKKTLinSys.hpp:385, doc :417-428): the compressed XYcYd system

  [ H+Dx   Jc^T   Jd^T    ] [dx ]   [rx_t]
  [ Jc     0      0       ] [dyc] = [ryc]
  [ Jd     0     -Dd^{-1} ] [dyd]   [ryd + Dd^{-1} rd_t]

with H = B_BFGS (+ optional primal regularization) is Schur-reduced onto the
(m_eq + m_ineq) dual space using the compact-BFGS inverse:

  N = J (H+Dx)^{-1} J^T + blkdiag(0, Dd^{-1})
  N [dyc;dyd] = J (H+Dx)^{-1} rx_t - [ryc; ryd + Dd^{-1} rd_t]
  dx = (H+Dx)^{-1} (rx_t - J^T [dyc;dyd]);   dd = Dd^{-1} (dyd + rd_t)

TPU mapping: (H+Dx)^{-1} applied to the m+1 right-hand sides is a batched
n-length solve (matmuls over the sharded n axis, psum contractions); the
m x m system is replicated and solved with Cholesky, falling back to LU with
a dual regularization bump — the reference's solveWithRefin plays the same
role (hiopKKTLinSys.hpp:434)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.optimization import hessian_lowrank as blr


class LowRankKKTData(NamedTuple):
    bfgs: blr.BfgsState
    Dx_tot: jax.Array   # Dx + delta_wx
    Dd: jax.Array       # barrier diagonal for d (positive on bounded ineqs)
    Jc: jax.Array       # (m_eq, n)
    Jd: jax.Array       # (m_ineq, n)


@jax.jit
def solve_compressed(
    data: LowRankKKTData,
    rx_t: jax.Array,
    rd_t: jax.Array,
    ryc: jax.Array,
    ryd: jax.Array,
):
    """Returns (dx, dd, dyc, dyd). Dd entries of 0 (inequality with no
    finite bounds) are guarded with a tiny floor."""
    mc = data.Jc.shape[0]
    md = data.Jd.shape[0]
    J = jnp.concatenate([data.Jc, data.Jd], axis=0)       # (m, n)
    dd_safe = jnp.maximum(data.Dd, 1e-30)
    dd_inv = jnp.where(data.Dd > 0, 1.0 / dd_safe, 0.0)

    # batched (H+Dx)^{-1} applications: [J^T | rx_t]
    nrhs = jnp.concatenate([J.T, rx_t[:, None]], axis=1)  # (n, m+1)
    Minv = blr.solve(data.bfgs, data.Dx_tot, nrhs)
    MinvJT = Minv[:, :-1]                                 # (n, m)
    Minv_rx = Minv[:, -1]                                 # (n,)

    N = J @ MinvJT                                        # (m, m), psum over n
    N = N + jnp.diag(jnp.concatenate([jnp.zeros((mc,), N.dtype), dd_inv]))

    rhs_y = J @ Minv_rx - jnp.concatenate([ryc, ryd + dd_inv * rd_t])

    # replicated small solve: Cholesky, refine once; LU fallback on failure
    dy = _sym_solve_with_refin(N, rhs_y)
    dyc, dyd = dy[:mc], dy[mc:]
    dx = Minv_rx - MinvJT @ dy
    dd = dd_inv * (dyd + rd_t)
    return dx, dd, dyc, dyd


def _sym_solve_with_refin(N: jax.Array, b: jax.Array) -> jax.Array:
    """Cholesky with one refinement sweep; LU fallback when N is not PD
    (reference: hiopKKTLinSysLowRank::solveWithRefin)."""
    m = N.shape[0]
    if m == 0:
        return b
    L = jnp.linalg.cholesky(N)
    ok = jnp.all(jnp.isfinite(L))

    def chol_solve(_):
        x0 = jax.scipy.linalg.cho_solve((L, True), b)
        r = b - N @ x0
        return x0 + jax.scipy.linalg.cho_solve((L, True), r)

    def lu_solve(_):
        # bump the diagonal for rank-deficient Jacobians and retry Cholesky
        # (no f64 LU on this TPU backend; see linalg/small_solve.py)
        eps = jnp.finfo(N.dtype).eps
        scale = jnp.maximum(jnp.max(jnp.abs(N)), 1.0)
        Nb = N + jnp.sqrt(eps) * scale * jnp.eye(m, dtype=N.dtype)
        Lb = jnp.linalg.cholesky(Nb)
        ok_b = jnp.all(jnp.isfinite(Lb))
        Lb = jnp.where(ok_b, Lb, jnp.eye(m, dtype=N.dtype))
        return jax.scipy.linalg.cho_solve((Lb, True), b)

    return jax.lax.cond(ok, chol_solve, lu_solve, None)
