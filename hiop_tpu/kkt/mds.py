"""KKT system for mixed dense-sparse (MDS) NLPs.

Parity with ``hiopKKTLinSysCompressedMDSXYcYd``
(/root/reference/src/Optimization/hiopKKTLinSysMDS.hpp:97, Schur assembly
cpp:172-276): variables split [x_s, x_d] with the Hessian block-diagonal —
a *diagonal* sparse block H_ss and a dense block H_dd. The sparse block is
eliminated through its diagonal inverse; the reference then assembles a
dense (n_d + m_eq + m_ineq) symmetric system (kernels
``addMDinvMtransToDiagBlockOfSymDeMatUTri``) and factorizes with
LAPACK/MAGMA.

TPU-first design: instead of one large symmetric-indefinite factorization,
do the full range-space reduction with two Cholesky factorizations::

  K_s = H_ss + Dx_s + delta_wx   (diagonal)
  K_d = H_dd + Dx_d + delta_wx   (n_d x n_d, chol on the MXU)
  S   = J_s K_s^{-1} J_s^T + J_d K_d^{-1} J_d^T
        + blkdiag(delta_cc I, (Dd+delta_wd)^{-1} + delta_cd I)   (m x m, chol)

The J_s products are dense matmuls over the (m, n_s) materialized sparse
Jacobian block — with m << n_s these are thin MXU matmuls, the TPU analogue
of the reference's CUDA Schur kernels. Failure of K_d's Cholesky signals
wrong inertia (primal regularization); failure of S signals a singular
Jacobian (dual regularization) — same ladder as kkt/newton_dense.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg.cholesky import cholesky as _chol


class MdsFactors(NamedTuple):
    ks_inv: jax.Array   # (n_s,) inverse of the diagonal sparse block
    Ld: jax.Array       # chol(K_d) (n_d, n_d)
    Ls: jax.Array       # chol(S) (m, m)
    Js: jax.Array       # (m, n_s) [Jc_s; Jd_s]
    Jdn: jax.Array      # (m, n_d) [Jc_d; Jd_d]
    dd_tot: jax.Array   # Dd + delta_wd
    ok_k: jax.Array
    ok_s: jax.Array
    ok: jax.Array


@jax.jit
def factorize(
    hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d,
    delta_wx, delta_wd, delta_cc, delta_cd,
):
    nd = Hdd.shape[0]
    mc, md = Jc_s.shape[0], Jd_s.shape[0]
    dt = Hdd.dtype

    ks = hss + Dxs + delta_wx
    ok_ks = jnp.all(ks > 0)
    ks_inv = jnp.where(ks > 0, 1.0 / jnp.maximum(ks, 1e-300), 0.0)

    Kd = Hdd + jnp.diag(Dxd + delta_wx)
    Ld = _chol(Kd)
    ok_kd = jnp.all(jnp.isfinite(Ld))
    ok_k = ok_ks & ok_kd
    Ld_safe = jnp.where(ok_kd, Ld, jnp.eye(nd, dtype=dt))

    Js = jnp.concatenate([Jc_s, Jd_s], axis=0)        # (m, n_s)
    Jdn = jnp.concatenate([Jc_d, Jd_d], axis=0)       # (m, n_d)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)

    KdinvJT = jax.scipy.linalg.cho_solve((Ld_safe, True), Jdn.T)   # (n_d, m)
    S = (Js * ks_inv) @ Js.T + Jdn @ KdinvJT + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, dt), dd_inv + delta_cd])
    )
    Ls = _chol(S)
    diag_s = jnp.diag(Ls)
    scale_s = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(S)), 1e-300)) if mc + md else 1.0
    thresh = jnp.sqrt(jnp.finfo(dt).eps) * scale_s * 1e-2
    dcc = jnp.asarray(delta_cc, dt)
    thresh = jnp.where(dcc > 0, jnp.minimum(thresh, 0.5 * jnp.sqrt(dcc)), thresh)
    tiny = jnp.min(jnp.abs(diag_s), initial=jnp.inf) < thresh
    ok_s = jnp.all(jnp.isfinite(Ls)) & ~tiny
    ok = ok_k & ok_s
    Ls_safe = jnp.where(ok_s, Ls, jnp.eye(mc + md, dtype=dt))
    return MdsFactors(ks_inv, Ld_safe, Ls_safe, Js, Jdn, dd_tot, ok_k, ok_s, ok)


@jax.jit
def solve(f: MdsFactors, rxs_t, rxd_t, rd_t, ryc, ryd):
    mc = ryc.shape[0]
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    Ksinv_rxs = f.ks_inv * rxs_t
    Kdinv_rxd = jax.scipy.linalg.cho_solve((f.Ld, True), rxd_t)
    rhs_y = f.Js @ Ksinv_rxs + f.Jdn @ Kdinv_rxd - jnp.concatenate(
        [ryc, ryd + dd_inv * rd_t]
    )
    dy = jax.scipy.linalg.cho_solve((f.Ls, True), rhs_y)
    dyc, dyd = dy[:mc], dy[mc:]
    dxs = f.ks_inv * (rxs_t - f.Js.T @ dy)
    dxd = jax.scipy.linalg.cho_solve(
        (f.Ld, True), rxd_t - f.Jdn.T @ dy
    )
    dd = dd_inv * (dyd + rd_t)
    return dxs, dxd, dd, dyc, dyd
