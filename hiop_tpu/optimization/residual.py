"""KKT residuals as a pytree.

Functional equivalent of ``hiopResidual``
(/root/reference/src/Optimization/hiopResidual.hpp:61). Residual blocks are
stored in the reference's right-hand-side convention: each block equals the
value such that the Newton system reads ``A * delta = r`` (i.e. the stored
block is the *negative* of the raw KKT residual for the optimality/
feasibility rows — see hiopResidual.cpp update(): rx is negated after
assembly, ryc = crhs - c(x), ryd = d_it - d(x); the bound rows rxl... are
stored unnegated and enter direction recovery as dsxl = dx + rxl).

Infinity/one norms of the optimality, feasibility, and complementarity
subsets are computed both for the NLP (mu=0, no damping) and the barrier
problem (with mu and damping), matching getNlpErrors/getBarrierErrors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg import vector_ops as vo
from hiop_tpu.optimization.iterate import Bounds, Iterate


class Residual(NamedTuple):
    rx: jax.Array
    rd: jax.Array
    ryc: jax.Array
    ryd: jax.Array
    rxl: jax.Array
    rxu: jax.Array
    rdl: jax.Array
    rdu: jax.Array
    rszl: jax.Array
    rszu: jax.Array
    rsvl: jax.Array
    rsvu: jax.Array


class ResidualNorms(NamedTuple):
    nlp_optim: jax.Array
    nlp_feasib: jax.Array
    nlp_complem: jax.Array
    bar_optim: jax.Array
    bar_feasib: jax.Array
    bar_complem: jax.Array
    nlp_feasib_onenorm: jax.Array   # theta for the filter
    bar_optim_onenorm: jax.Array
    cons_violation: jax.Array       # true bound/equality violation of c(x), d(x)


@jax.jit
def update_residual(
    it: Iterate,
    c: jax.Array,
    d: jax.Array,
    grad_f: jax.Array,
    jacT_yc: jax.Array,
    jacT_yd: jax.Array,
    crhs: jax.Array,
    b: Bounds,
    mu,
    kappa_d: float = 1e-5,
):
    """Assemble all 12 blocks + norms (hiopResidual::update).

    jacT_yc / jacT_yd are Jc^T yc and Jd^T yd, precomputed by the caller so
    this function stays formulation-agnostic (dense/sparse/MDS Jacobians all
    reduce to these two matvecs).
    Returns (Residual, ResidualNorms).
    """
    # optimality rows
    rx_raw = grad_f + jacT_yc + jacT_yd - it.zl + it.zu
    nlp_optim = vo.infnorm(rx_raw)
    nlp_optim_1 = vo.onenorm(rx_raw)
    # damping enters the barrier residual only
    damp_x = (b.ixl - b.ixu) * (kappa_d * mu)
    rx = -(rx_raw + damp_x)
    bar_optim = vo.infnorm(rx)
    bar_optim_1 = vo.onenorm(rx)

    rd_raw = it.yd + it.vl - it.vu
    nlp_optim = jnp.maximum(nlp_optim, vo.infnorm(rd_raw))
    nlp_optim_1 = nlp_optim_1 + vo.onenorm(rd_raw)
    damp_d = (b.idl - b.idu) * (kappa_d * mu)
    rd = rd_raw - damp_d
    bar_optim = jnp.maximum(bar_optim, vo.infnorm(rd))
    bar_optim_1 = bar_optim_1 + vo.onenorm(rd)

    # feasibility rows
    ryc = crhs - c
    ryd = it.d - d
    nlp_feasib = jnp.maximum(vo.infnorm(ryc), vo.infnorm(ryd))
    nlp_feasib_1 = vo.onenorm(ryc) + vo.onenorm(ryd)

    # true constraint violation (uses d(x), not the slack iterate d)
    viol_eq = vo.infnorm(ryc)
    viol_dl = jnp.maximum(0.0, -jnp.min(jnp.where(b.idl == 1.0, d - b.dl, jnp.inf), initial=jnp.inf))
    viol_du = jnp.maximum(0.0, -jnp.min(jnp.where(b.idu == 1.0, b.du - d, jnp.inf), initial=jnp.inf))
    cons_violation = jnp.maximum(viol_eq, jnp.maximum(viol_dl, viol_du))

    # bound rows (zero when slacks are consistent; kept for SOC/IR paths)
    rxl = jnp.where(b.ixl == 1.0, it.x - it.sxl - b.xl, 0.0)
    rxu = jnp.where(b.ixu == 1.0, b.xu - it.x - it.sxu, 0.0)
    rdl = jnp.where(b.idl == 1.0, it.d - it.sdl - b.dl, 0.0)
    rdu = jnp.where(b.idu == 1.0, b.du - it.d - it.sdu, 0.0)

    # complementarity rows: stored = mu e - s.*z on pattern
    sz_xl = jnp.where(b.ixl == 1.0, it.sxl * it.zl, 0.0)
    sz_xu = jnp.where(b.ixu == 1.0, it.sxu * it.zu, 0.0)
    sv_dl = jnp.where(b.idl == 1.0, it.sdl * it.vl, 0.0)
    sv_du = jnp.where(b.idu == 1.0, it.sdu * it.vu, 0.0)
    nlp_complem = jnp.maximum(
        jnp.maximum(vo.infnorm(sz_xl), vo.infnorm(sz_xu)),
        jnp.maximum(vo.infnorm(sv_dl), vo.infnorm(sv_du)),
    )
    rszl = jnp.where(b.ixl == 1.0, mu - sz_xl, 0.0)
    rszu = jnp.where(b.ixu == 1.0, mu - sz_xu, 0.0)
    rsvl = jnp.where(b.idl == 1.0, mu - sv_dl, 0.0)
    rsvu = jnp.where(b.idu == 1.0, mu - sv_du, 0.0)
    bar_complem = jnp.maximum(
        jnp.maximum(vo.infnorm(rszl), vo.infnorm(rszu)),
        jnp.maximum(vo.infnorm(rsvl), vo.infnorm(rsvu)),
    )

    res = Residual(rx, rd, ryc, ryd, rxl, rxu, rdl, rdu, rszl, rszu, rsvl, rsvu)
    norms = ResidualNorms(
        nlp_optim=nlp_optim,
        nlp_feasib=nlp_feasib,
        nlp_complem=nlp_complem,
        bar_optim=bar_optim,
        bar_feasib=nlp_feasib,
        bar_complem=bar_complem,
        nlp_feasib_onenorm=nlp_feasib_1,
        bar_optim_onenorm=bar_optim_1,
        cons_violation=cons_violation,
    )
    return res, norms


@jax.jit
def compress_rhs_xdycyd(res: Residual, it: Iterate, b: Bounds):
    """Fold bound/complementarity rows into the 4-block XDYcYd RHS
    (doc: hiopKKTLinSys.hpp:334-345). Returns (rx_t, rd_t, ryc, ryd)::

      rx_t = rx + Sxl^{-1}(rszl - Zl rxl) - Sxu^{-1}(rszu - Zu rxu)
      rd_t = rd + Sdl^{-1}(rsvl - Vl rdl) - Sdu^{-1}(rsvu - Vu rdu)
    """
    sxl = jnp.where(b.ixl == 1.0, it.sxl, 1.0)
    sxu = jnp.where(b.ixu == 1.0, it.sxu, 1.0)
    sdl = jnp.where(b.idl == 1.0, it.sdl, 1.0)
    sdu = jnp.where(b.idu == 1.0, it.sdu, 1.0)
    rx_t = (
        res.rx
        + jnp.where(b.ixl == 1.0, (res.rszl - it.zl * res.rxl) / sxl, 0.0)
        - jnp.where(b.ixu == 1.0, (res.rszu - it.zu * res.rxu) / sxu, 0.0)
    )
    rd_t = (
        res.rd
        + jnp.where(b.idl == 1.0, (res.rsvl - it.vl * res.rdl) / sdl, 0.0)
        - jnp.where(b.idu == 1.0, (res.rsvu - it.vu * res.rdu) / sdu, 0.0)
    )
    return rx_t, rd_t, res.ryc, res.ryd


@jax.jit
def recover_direction(
    res: Residual, it: Iterate, b: Bounds, dx, dd, dyc, dyd
) -> Iterate:
    """Back-substitute the eliminated rows to the full 12-block direction::

      dsxl = dx + rxl            dzl = Sxl^{-1}(rszl - Zl dsxl)
      dsxu = rxu - dx            dzu = Sxu^{-1}(rszu - Zu dsxu)
      dsdl = dd + rdl            dvl = Sdl^{-1}(rsvl - Vl dsdl)
      dsdu = rdu - dd            dvu = Sdu^{-1}(rsvu - Vu dsdu)
    """
    sxl = jnp.where(b.ixl == 1.0, it.sxl, 1.0)
    sxu = jnp.where(b.ixu == 1.0, it.sxu, 1.0)
    sdl = jnp.where(b.idl == 1.0, it.sdl, 1.0)
    sdu = jnp.where(b.idu == 1.0, it.sdu, 1.0)
    dsxl = jnp.where(b.ixl == 1.0, dx + res.rxl, 0.0)
    dsxu = jnp.where(b.ixu == 1.0, res.rxu - dx, 0.0)
    dsdl = jnp.where(b.idl == 1.0, dd + res.rdl, 0.0)
    dsdu = jnp.where(b.idu == 1.0, res.rdu - dd, 0.0)
    dzl = jnp.where(b.ixl == 1.0, (res.rszl - it.zl * dsxl) / sxl, 0.0)
    dzu = jnp.where(b.ixu == 1.0, (res.rszu - it.zu * dsxu) / sxu, 0.0)
    dvl = jnp.where(b.idl == 1.0, (res.rsvl - it.vl * dsdl) / sdl, 0.0)
    dvu = jnp.where(b.idu == 1.0, (res.rsvu - it.vu * dsdu) / sdu, 0.0)
    return Iterate(dx, dd, dsxl, dsxu, dsdl, dsdu, dyc, dyd, dzl, dzu, dvl, dvu)


@jax.jit
def barrier_diagonals(it: Iterate, b: Bounds):
    """Dx = Sxl^{-1}Zl + Sxu^{-1}Zu and Dd = Sdl^{-1}Vl + Sdu^{-1}Vu."""
    sxl = jnp.where(b.ixl == 1.0, it.sxl, 1.0)
    sxu = jnp.where(b.ixu == 1.0, it.sxu, 1.0)
    sdl = jnp.where(b.idl == 1.0, it.sdl, 1.0)
    sdu = jnp.where(b.idu == 1.0, it.sdu, 1.0)
    Dx = jnp.where(b.ixl == 1.0, it.zl / sxl, 0.0) + jnp.where(
        b.ixu == 1.0, it.zu / sxu, 0.0
    )
    Dd = jnp.where(b.idl == 1.0, it.vl / sdl, 0.0) + jnp.where(
        b.idu == 1.0, it.vu / sdu, 0.0
    )
    return Dx, Dd
