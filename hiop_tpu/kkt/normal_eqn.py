"""Normal-equations KKT system for diagonal-Hessian (LP/QP) problems.

Parity with ``hiopKKTLinSysSparseNormalEqn``
(/root/reference/src/Optimization/hiopKKTLinSysSparseNormalEqn.hpp:67-89):
when H + Dx + delta_wx is diagonal, eliminate dx and dd from XDYcYd to the
SPD system in the constraint duals::

  [ Jc Hx^{-1} Jc^T + delta_cc*I        Jc Hx^{-1} Jd^T                  ] [dyc]
  [ Jd Hx^{-1} Jc^T   Jd Hx^{-1} Jd^T + (Dd+delta_wd)^{-1} + delta_cd*I ] [dyd]
      = [ Jc Hx^{-1} rx_t - ryc ; Jd Hx^{-1} rx_t - ryd - (Dd+delta_wd)^{-1} rd_t ]

then dx = Hx^{-1}(rx_t - Jc^T dyc - Jd^T dyd), dd = (Dd+delta_wd)^{-1}(rd_t+dyd).
Cholesky of the m x m system (reference: cuSOLVER-Cholesky / CSR-MA57)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg.cholesky import cholesky as _chol


class NormalEqnFactors(NamedTuple):
    Ls: jax.Array      # chol of the m x m system
    Jc: jax.Array
    Jd: jax.Array
    hx_inv: jax.Array  # (n,) inverse of the diagonal H + Dx + delta_wx
    dd_inv: jax.Array  # (m_ineq,)
    ok: jax.Array


@jax.jit
def factorize(h_diag, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    mc, md = Jc.shape[0], Jd.shape[0]
    hx = h_diag + Dx + delta_wx
    ok_h = jnp.all(hx > 0)
    hx_inv = jnp.where(hx > 0, 1.0 / jnp.maximum(hx, 1e-300), 0.0)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)
    J = jnp.concatenate([Jc, Jd], axis=0)
    S = (J * hx_inv) @ J.T + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, J.dtype), dd_inv + delta_cd])
    )
    Ls = _chol(S)
    ok = ok_h & jnp.all(jnp.isfinite(Ls))
    Ls_safe = jnp.where(ok, Ls, jnp.eye(mc + md, dtype=J.dtype))
    return NormalEqnFactors(Ls_safe, Jc, Jd, hx_inv, dd_inv, ok)


@jax.jit
def solve(f: NormalEqnFactors, rx_t, rd_t, ryc, ryd):
    mc = f.Jc.shape[0]
    J = jnp.concatenate([f.Jc, f.Jd], axis=0)
    rhs = J @ (f.hx_inv * rx_t) - jnp.concatenate([ryc, ryd + f.dd_inv * rd_t])
    dy = jax.scipy.linalg.cho_solve((f.Ls, True), rhs)
    dyc, dyd = dy[:mc], dy[mc:]
    dx = f.hx_inv * (rx_t - J.T @ dy)
    dd = f.dd_inv * (rd_t + dyd)
    return dx, dd, dyc, dyd
