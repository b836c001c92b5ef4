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


# ---------------------------------------------------------------------------
# Direct solve of the unreduced system (hiopKKTLinSysSparseFull,
# /root/reference/src/Optimization/hiopKKTLinSysSparse.hpp:202): the
# reference assembles the nonsymmetric 12-block matrix in triplet form and
# hands it to a non-symmetric direct solver (PARDISO/STRUMPACK,
# hiopKKTLinSysSparse.cpp:845-849).  Here the matrix is materialized by
# batching `full_kkt_matvec` over the identity (one XLA program — the
# operator definition above stays the single source of truth) and LU-solved
# on the host (LAPACK dgetrf), mirroring the safe-path convention.  No
# inertia is available from a nonsymmetric LU, so the caller must use the
# inertia-free curvature acceptor — same constraint as the reference's
# PARDISO-nonsym branch.


def _flatten_dir(d: Iterate) -> jax.Array:
    return jnp.concatenate(
        [d.x, d.d, d.yc, d.yd, d.sxl, d.sxu, d.sdl, d.sdu, d.zl, d.zu, d.vl, d.vu]
    )


def _unflatten_dir(v: jax.Array, t: Iterate) -> Iterate:
    nx, nd = t.x.size, t.d.size
    myc, myd = t.yc.size, t.yd.size
    sizes = [nx, nd, myc, myd, nx, nx, nd, nd, nx, nx, nd, nd]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    parts = [v[offs[i]:offs[i + 1]] for i in range(12)]
    return Iterate(
        x=parts[0], d=parts[1], yc=parts[2], yd=parts[3],
        sxl=parts[4], sxu=parts[5], sdl=parts[6], sdu=parts[7],
        zl=parts[8], zu=parts[9], vl=parts[10], vu=parts[11],
    )


def _flatten_res(r: Residual) -> jax.Array:
    return jnp.concatenate(
        [r.rx, r.rd, r.ryc, r.ryd, r.rxl, r.rxu, r.rdl, r.rdu,
         r.rszl, r.rszu, r.rsvl, r.rsvu]
    )


@jax.jit
def assemble_full(H, Jc, Jd, it: Iterate, b: Bounds,
                  delta_wx, delta_wd, delta_cc, delta_cd):
    """Materialize the full KKT matrix column-by-column from the operator.

    Row/column orders pair bound rows with their slack columns and
    complementarity rows with their dual columns, so the zero rows/columns
    of *inactive* bound entries sit on the diagonal; those diagonals are
    set to 1 (with zero RHS the decoupled entries solve to 0)."""
    ones_x = jnp.ones_like(it.x)
    ones_d = jnp.ones_like(it.d)
    ones_c = jnp.ones_like(it.yc)
    ones_y = jnp.ones_like(it.yd)
    mask = jnp.concatenate(
        [ones_x, ones_d, ones_c, ones_y, b.ixl, b.ixu, b.idl, b.idu,
         b.ixl, b.ixu, b.idl, b.idu]
    )
    n_tot = mask.size

    def col(e):
        d = _unflatten_dir(e, it)
        out = full_kkt_matvec(
            H, Jc, Jd, it, b, delta_wx, delta_wd, delta_cc, delta_cd, d
        )
        return _flatten_res(out)

    A = jax.vmap(col)(jnp.eye(n_tot, dtype=it.x.dtype)).T
    return A + jnp.diag(1.0 - mask)


class FullFactors:
    """Host LU factors of the assembled unreduced system."""

    __slots__ = ("ok", "lu", "piv", "template")

    def __init__(self, ok, lu, piv, template):
        self.ok = ok
        self.lu = lu
        self.piv = piv
        self.template = template


def factorize_full(H, Jc, Jd, it: Iterate, b: Bounds, deltas) -> FullFactors:
    import numpy as np
    import scipy.linalg as sla

    A = np.asarray(assemble_full(H, Jc, Jd, it, b, *deltas))
    if not np.all(np.isfinite(A)):
        return FullFactors(False, None, None, it)
    lu, piv = sla.lu_factor(A, check_finite=False)
    diag = np.abs(np.diag(lu))
    ok = bool(np.all(np.isfinite(lu))) and bool(
        np.min(diag) > np.finfo(A.dtype).eps * max(1.0, float(np.max(diag)))
    )
    return FullFactors(ok, lu, piv, it)


def solve_full(f: FullFactors, resid: Residual) -> Iterate:
    import numpy as np
    import scipy.linalg as sla

    rhs = np.asarray(_flatten_res(residual_to_rhs(resid)))
    sol = sla.lu_solve((f.lu, f.piv), rhs, check_finite=False)
    return _unflatten_dir(jnp.asarray(sol), f.template)
