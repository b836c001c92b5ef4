"""Full (unreduced) 12-block KKT operator.

Parity with ``hiopMatVecKKTFullOpr`` (/root/reference/src/Optimization/
hiopKKTLinSys.hpp:615, doc :463-501): the matrix-vector product of the full
primal-dual KKT system on the compound direction pytree (the reference's
``hiopVectorCompoundPD`` of dimension 5nx+5nd+nyc+nyd is our Iterate
pytree). Used by the outer BiCGStab iterative refinement, with the
compressed direct solve as preconditioner (compute_directions_w_IR).

Row convention matches the Residual storage (A * delta = r): e.g. the x-row
maps delta to H dx + delta_wx dx + Jc^T dyc + Jd^T dyd - dzl + dzu, whose
residual against rx measures the full-system error of a computed direction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hiop_tpu.optimization.iterate import Bounds, Iterate
from hiop_tpu.optimization.residual import Residual


@jax.jit
def full_kkt_matvec(
    H: jax.Array,
    Jc: jax.Array,
    Jd: jax.Array,
    it: Iterate,
    b: Bounds,
    delta_wx,
    delta_wd,
    delta_cc,
    delta_cd,
    d: Iterate,
) -> Residual:
    """A @ d for the full KKT matrix at iterate `it` (slacks/duals define the
    complementarity rows). Returns a Residual-shaped pytree."""
    JcT_dyc = Jc.T @ d.yc if Jc.shape[0] else jnp.zeros_like(d.x)
    JdT_dyd = Jd.T @ d.yd if Jd.shape[0] else jnp.zeros_like(d.x)
    rx = H @ d.x + delta_wx * d.x + JcT_dyc + JdT_dyd - d.zl + d.zu
    rd = delta_wd * d.d - d.yd - d.vl + d.vu
    ryc = Jc @ d.x - delta_cc * d.yc if Jc.shape[0] else jnp.zeros((0,), d.x.dtype)
    ryd = Jd @ d.x - d.d - delta_cd * d.yd if Jd.shape[0] else jnp.zeros((0,), d.x.dtype)
    rxl = jnp.where(b.ixl == 1.0, d.x - d.sxl, 0.0)
    rxu = jnp.where(b.ixu == 1.0, -d.x - d.sxu, 0.0)
    rdl = jnp.where(b.idl == 1.0, d.d - d.sdl, 0.0)
    rdu = jnp.where(b.idu == 1.0, -d.d - d.sdu, 0.0)
    rszl = jnp.where(b.ixl == 1.0, it.zl * d.sxl + it.sxl * d.zl, 0.0)
    rszu = jnp.where(b.ixu == 1.0, it.zu * d.sxu + it.sxu * d.zu, 0.0)
    rsvl = jnp.where(b.idl == 1.0, it.vl * d.sdl + it.sdl * d.vl, 0.0)
    rsvu = jnp.where(b.idu == 1.0, it.vu * d.sdu + it.sdu * d.vu, 0.0)
    return Residual(rx, rd, ryc, ryd, rxl, rxu, rdl, rdu, rszl, rszu, rsvl, rsvu)


def residual_to_rhs(res: Residual) -> Residual:
    """The stored Residual *is* the Newton RHS; identity for clarity.

    Note the stored bound rows rxl/rdu use the sign convention
    dsxl = dx + rxl (see residual.py); the matvec above produces
    dx - dsxl in the xl row, so the matching RHS entry is -rxl.
    """
    return res._replace(rxl=-res.rxl, rxu=-res.rxu, rdl=-res.rdl, rdu=-res.rdu)


def direction_residual(H, Jc, Jd, it, b, deltas, res: Residual, d: Iterate) -> Residual:
    """RHS - A @ d: the full-system residual of a computed direction."""
    delta_wx, delta_wd, delta_cc, delta_cd = deltas
    Ad = full_kkt_matvec(H, Jc, Jd, it, b, delta_wx, delta_wd, delta_cc, delta_cd, d)
    rhs = residual_to_rhs(res)
    return jax.tree.map(lambda r, a: r - a, rhs, Ad)


@jax.jit
def direction_residual_norms(H, Jc, Jd, it, b, delta_wx, delta_wd, delta_cc, delta_cd, res, d):
    """(||rhs - A d||, ||rhs||) in one fused dispatch — the IR gate check."""
    Ad = full_kkt_matvec(H, Jc, Jd, it, b, delta_wx, delta_wd, delta_cc, delta_cd, d)
    rhs = residual_to_rhs(res)
    diff2 = sum(
        jax.tree.leaves(jax.tree.map(lambda r, a: jnp.vdot(r - a, r - a), rhs, Ad))
    )
    rhs2 = sum(jax.tree.leaves(jax.tree.map(lambda r: jnp.vdot(r, r), rhs)))
    return jnp.sqrt(diff2), jnp.sqrt(rhs2)
