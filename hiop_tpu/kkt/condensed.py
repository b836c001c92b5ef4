"""Condensed KKT system for inequality-only NLPs.

Parity with ``hiopKKTLinSysCondensedSparse``
(/root/reference/src/Optimization/hiopKKTLinSysSparseCondensed.hpp:65-104):
for problems with no equality constraints (equalities are relaxed into tight
two-sided inequalities by the formulation, option ``eq_relax_factor``,
mirroring hiopNlpSparseIneq), the XDYcYd system condenses to the SPD matrix

  K = H + Dx + delta_wx*I + Jd^T Dd_tilde Jd,
  Dd_tilde = (Dd + delta_wd) (I + delta_cd (Dd + delta_wd))^{-1}

solved with Cholesky — exactly the reduction the reference uses for its
GPU (cuSOLVER-Cholesky) path; on TPU the Cholesky is XLA's blocked potrf on
the MXU. Direction recovery::

  dd  = T (Jd dx - ryd + delta_cd rd_t),  T = (I + delta_cd (Dd+delta_wd))^{-1}
  dyd = (Dd + delta_wd) dd - rd_t
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg.cholesky import cholesky as _chol


class CondensedFactors(NamedTuple):
    Lk: jax.Array        # chol(K)
    Jd: jax.Array
    dd_tot: jax.Array    # Dd + delta_wd
    T: jax.Array         # (I + delta_cd*(Dd+delta_wd))^{-1} diagonal
    ok: jax.Array


@jax.jit
def factorize(H, Dx, Dd, Jd, delta_wx, delta_wd, delta_cd):
    n = H.shape[0]
    dd_tot = Dd + delta_wd
    T = 1.0 / (1.0 + delta_cd * dd_tot)
    dd_tilde = dd_tot * T
    K = H + jnp.diag(Dx + delta_wx) + (Jd.T * dd_tilde) @ Jd
    Lk = _chol(K)
    ok = jnp.all(jnp.isfinite(Lk))
    Lk_safe = jnp.where(ok, Lk, jnp.eye(n, dtype=K.dtype))
    return CondensedFactors(Lk_safe, Jd, dd_tot, T, ok)


@jax.jit
def solve(f: CondensedFactors, rx_t, rd_t, ryd, delta_cd):
    dd_tilde = f.dd_tot * f.T
    rhs = rx_t + f.Jd.T @ (dd_tilde * (ryd - delta_cd * rd_t) + rd_t)
    dx = jax.scipy.linalg.cho_solve((f.Lk, True), rhs)
    dd = f.T * (f.Jd @ dx - ryd + delta_cd * rd_t)
    dyd = f.dd_tot * dd - rd_t
    return dx, dd, dyd
