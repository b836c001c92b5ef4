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

from functools import partial

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


def build_schur_pairs(stacked_rows, cols, n_s, max_pairs=8_000_000):
    """Precompute (once per problem) the index arrays driving
    :func:`schur_js_triplets`: all ordered pairs of sparse-Jacobian
    nonzeros sharing a column, with their stacked row coordinates.
    ``stacked_rows`` must follow the [eq; m_eq + ineq] row order of the
    Js = [Jc_s; Jd_s] concatenation. Returns None (dense fallback) when
    the pair count exceeds ``max_pairs`` or the structure holds duplicate
    (row, col) entries (the dense materialization sums duplicates, which
    the pairwise products would overcount)."""
    import numpy as np

    stacked_rows = np.asarray(stacked_rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nnz = cols.size
    if nnz == 0:
        return None
    m_span = int(stacked_rows.max()) + 1
    if np.unique(stacked_rows * n_s + cols).size != nnz:
        return None
    order = np.argsort(cols, kind="stable")
    counts = np.bincount(cols, minlength=n_s)
    n_pairs = int(np.sum(counts.astype(np.int64) ** 2))
    if n_pairs == 0 or n_pairs > max_pairs:
        return None
    starts = np.concatenate([[0], np.cumsum(counts)])
    pa_parts, pb_parts = [], []
    for c in np.nonzero(counts)[0]:
        idx = order[starts[c]:starts[c + 1]]
        d = idx.size
        pa_parts.append(np.repeat(idx, d))
        pb_parts.append(np.tile(idx, d))
    pa = np.concatenate(pa_parts)
    pb = np.concatenate(pb_parts)
    pvar = cols[pa]
    prow = stacked_rows[pa]
    pcol = stacked_rows[pb]
    del m_span
    return tuple(
        jnp.asarray(x.astype(np.int32)) for x in (pa, pb, pvar, prow, pcol)
    )


@partial(jax.jit, static_argnames=("m",))
def schur_js_triplets(js_vals, ks_inv, pairs, m: int):
    """Js Ks^{-1} Js^T assembled from the sparse-block TRIPLETS: for every
    pair of nonzeros (a, b) sharing a column c,
    S[row_a, row_b] += v_a * v_b * ks_inv[c] — one fused gather-multiply +
    1D scatter-add, O(sum_c deg_c^2) work instead of the dense
    (m, n_s) @ (n_s, m) product (2.4e11 FLOPs -> ~5e5 updates on the
    B=512 ACOPF driver). This is the reference's triplet Schur kernel
    family (addMDinvMtransToDiagBlockOfSymDeMatUTri etc.,
    hiopMatrixSparseTriplet.hpp / hiopKKTLinSysMDS.cpp:172-276) realized
    as an XLA scatter instead of a hand-written CUDA kernel."""
    pa, pb, pvar, prow, pcol = pairs
    prod = js_vals[pa] * js_vals[pb] * ks_inv[pvar]
    flat = jnp.zeros((m * m,), js_vals.dtype).at[prow * m + pcol].add(prod)
    return flat.reshape(m, m)


def schur_js_triplets_sharded(js_vals, ks_inv, pairs, m: int, mesh, axis: str = "x"):
    """Mesh-sharded triplet Schur assembly: the pair list is partitioned
    over the mesh axis (padded with zero-contribution entries), each device
    scatter-adds its partial (m, m) sum, and one ``psum`` over ICI yields
    the replicated Schur matrix — the multi-chip Newton analogue of the
    QN path's n-axis distribution (SURVEY.md §2.9: partial local products
    + allreduce, here over same-column nonzero pairs instead of vector
    slices). The replicated S then feeds the replicated Cholesky, exactly
    the reference's replicated-small-solve pattern."""
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    pa, pb, pvar, prow, pcol = (np.asarray(a) for a in pairs)
    n_pairs = pa.size
    pad = (-n_pairs) % n_dev
    if pad:
        # padding pairs index entry 0 but write through a zero weight
        pa = np.concatenate([pa, np.zeros(pad, pa.dtype)])
        pb = np.concatenate([pb, np.zeros(pad, pb.dtype)])
        pvar = np.concatenate([pvar, np.zeros(pad, pvar.dtype)])
        prow = np.concatenate([prow, np.zeros(pad, prow.dtype)])
        pcol = np.concatenate([pcol, np.zeros(pad, pcol.dtype)])
    w = (np.arange(n_pairs + pad) < n_pairs).astype(np.float64)
    parts = tuple(jnp.asarray(a) for a in (pa, pb, pvar, prow, pcol))
    wj = jnp.asarray(w)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def _assemble(vals, kinv, pa_, pb_, pvar_, prow_, pcol_, w_):
        prod = vals[pa_] * vals[pb_] * kinv[pvar_] * w_.astype(vals.dtype)
        part = jnp.zeros((m * m,), vals.dtype).at[prow_ * m + pcol_].add(prod)
        return jax.lax.psum(part, axis)

    return _assemble(js_vals, ks_inv, *parts, wj).reshape(m, m)


def _factorize_core(
    hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d,
    delta_wx, delta_wd, delta_cc, delta_cd,
    js_vals=None, js_pairs=None,
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
    if js_pairs is not None:
        JKJt = schur_js_triplets(js_vals, ks_inv, js_pairs, mc + md)
    else:
        JKJt = (Js * ks_inv) @ Js.T
    S = JKJt + Jdn @ KdinvJT + jnp.diag(
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


#: js_vals (optional) follows the [eq; ineq] stacked row order and
#: js_pairs = (pair_a, pair_b, pair_var, pair_row, pair_col) int32 arrays
#: select the triplet-Schur assembly (schur_js_triplets)
factorize = jax.jit(_factorize_core)


class MdsSaddleDeviceFactors(NamedTuple):
    """Traceable (jit/while_loop-safe) MDS saddle factors: the diagonal
    sparse block eliminated with its SIGNED inverse, the (n_d + m) saddle
    factorized by the on-device blocked no-pivot LDL^T, inertia by pivot
    signs + Haynsworth additivity for the eliminated diagonal. All leaves
    are arrays, so this flows through lax.while_loop carries — the fused
    (jit_mode=iteration/solve) inertia-revealing KKT realization.

    The saddle is symmetrically row-max equilibrated before factorization
    (a congruence — inertia preserved; ``s`` holds the scale): without it
    the no-pivot breakdown test (pivot magnitude vs eps * max|M|) misfires
    on barrier-scaled saddles whose row scales span ~1e9, spuriously
    failing the f64 certification fallback exactly at the degenerate
    late-barrier points that need it (observed as fused st=6 exits at
    B=512)."""
    L: jax.Array        # unit-lower LDL factor of s M s (padded)
    d: jax.Array        # pivots (padded)
    s: jax.Array        # (nd+m,) equilibration scale
    ks_inv: jax.Array
    Js: jax.Array
    Jdn: jax.Array
    dd_tot: jax.Array
    ok: jax.Array       # finite factorization AND inertia == mc + md


def factorize_saddle_device(
    hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d,
    delta_wx, delta_wd, delta_cc, delta_cd,
):
    """Traceable analogue of :func:`factorize_safe` (host=False) with the
    inertia acceptance folded into ``ok``: ok means the factorization is
    finite AND n_neg(saddle) + n_neg(eliminated diag) == mc + md — the
    reference's hiopFactAcceptorIC criterion evaluated on device, so the
    fused regularization ladder (fused_newton.fact_with_reg) leaves
    delta_w at 0 whenever the true reduced Hessian is positive definite."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    mc, md = Jc_s.shape[0], Jd_s.shape[0]
    dt = Hdd.dtype
    tol_ks = 1e-14

    ks = hss + Dxs + delta_wx
    ks_ok = jnp.all(jnp.abs(ks) > tol_ks)
    n_neg_ks = jnp.sum(ks < -tol_ks)
    ks_inv = jnp.where(
        jnp.abs(ks) > tol_ks, 1.0 / jnp.where(ks == 0, 1.0, ks), 0.0
    )
    Js = jnp.concatenate([Jc_s, Jd_s], axis=0)
    Jdn = jnp.concatenate([Jc_d, Jd_d], axis=0)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)

    Kd = Hdd + jnp.diag(Dxd + delta_wx)
    C = (Js * ks_inv) @ Js.T + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, dt), dd_inv + delta_cd])
    )
    M = jnp.block([[Kd, Jdn.T], [Jdn, -C]])
    rmax = jnp.max(jnp.abs(M), axis=1)
    s = jnp.where(rmax > 0, 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-300)), 1.0)
    f = _ldl.ldl_factor(s[:, None] * M * s[None, :])
    ok = f.ok & ks_ok & (f.n_neg + n_neg_ks == mc + md)
    return MdsSaddleDeviceFactors(f.L, f.d, s, ks_inv, Js, Jdn, dd_tot, ok)


def solve_saddle_device(f: MdsSaddleDeviceFactors, rxs_t, rxd_t, rd_t, ryc, ryd):
    """Direction recovery for :func:`factorize_saddle_device` (traceable)."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    nd = rxd_t.shape[0]
    mc = ryc.shape[0]
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    rhs_y = jnp.concatenate([ryc, ryd + dd_inv * rd_t]) - f.Js @ (f.ks_inv * rxs_t)
    rhs = jnp.concatenate([rxd_t, rhs_y])
    lf = _ldl.LdlFactors(f.L, f.d, rhs.shape[0], jnp.asarray(0), f.ok)
    sol = f.s * _ldl.ldl_solve(lf, f.s * rhs)
    dxd = sol[:nd]
    dy = sol[nd:]
    dyc, dyd = dy[:mc], dy[mc:]
    dxs = f.ks_inv * (rxs_t - f.Js.T @ dy)
    dd = dd_inv * (rd_t + dyd)
    return dxs, dxd, dd, dyc, dyd


class MdsSaddleDeviceMpFactors(NamedTuple):
    """Mixed-precision fused-path factors: the f64 saddle M is symmetrically
    row-max equilibrated (a congruence — inertia preserved), cast to f32 and
    factorized by the blocked no-pivot LDL^T ON THE MXU; M itself is kept
    for the f64 iterative-refinement matvecs. This is the ReSolve pattern
    (f32-speed factorization + f64 IR certification,
    /root/reference/src/LinAlg/ReSolve/RefactorizationSolver.hpp:74,
    IterativeRefinement.hpp:25) realized entirely on device inside one XLA
    program: at the B=512 ACOPF shape the 4710^2 f64 emulated LDL^T costs
    29-66 s while the equilibrated f32 factorization is ~10^3 x cheaper.
    All leaves are arrays (lax.while_loop-safe)."""
    L: jax.Array        # f32 unit-lower LDL factor (padded)
    d: jax.Array        # f32 pivots (padded)
    s: jax.Array        # (nd+m,) f64 equilibration scale
    M: jax.Array        # (nd+m, nd+m) f64 saddle (IR operator)
    ks_inv: jax.Array
    Js: jax.Array
    Jdn: jax.Array
    dd_tot: jax.Array
    ok: jax.Array       # finite f32 factorization AND inertia == mc + md
    n_neg: jax.Array    # f32 pivot-sign negative count incl. eliminated diag


def factorize_saddle_device_mp(
    hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d,
    delta_wx, delta_wd, delta_cc, delta_cd, count_inertia: bool = True,
):
    """Traceable mixed-precision analogue of :func:`factorize_saddle_device`:
    assemble the saddle in f64, equilibrate, factorize in f32. Inertia
    acceptance (pivot signs + Haynsworth count of the eliminated diagonal)
    is folded into ``ok`` exactly as in the f64 variant — the equilibration
    D M D is a congruence, so the f32 pivot signs count the same inertia.
    ``count_inertia=False`` drops the count from ``ok`` (finite
    factorization only) for the inertia-free curvature acceptance
    (hiopFactAcceptorInertiaFreeDWD), where the caller tests the computed
    direction instead."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    mc, md = Jc_s.shape[0], Jd_s.shape[0]
    dt = Hdd.dtype
    tol_ks = 1e-14

    ks = hss + Dxs + delta_wx
    ks_ok = jnp.all(jnp.abs(ks) > tol_ks)
    n_neg_ks = jnp.sum(ks < -tol_ks)
    ks_inv = jnp.where(
        jnp.abs(ks) > tol_ks, 1.0 / jnp.where(ks == 0, 1.0, ks), 0.0
    )
    Js = jnp.concatenate([Jc_s, Jd_s], axis=0)
    Jdn = jnp.concatenate([Jc_d, Jd_d], axis=0)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)

    Kd = Hdd + jnp.diag(Dxd + delta_wx)
    C = (Js * ks_inv) @ Js.T + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, dt), dd_inv + delta_cd])
    )
    M = jnp.block([[Kd, Jdn.T], [Jdn, -C]])

    # symmetric row-max equilibration: the barrier diagonals blow up as
    # mu -> 0 (Dx ~ z/s with active slacks -> 0); scaling the huge rows to
    # unit max keeps the f32 factorization's condition number bounded far
    # below 1/eps_f32 deep into the barrier trajectory
    rmax = jnp.max(jnp.abs(M), axis=1)
    s = jnp.where(rmax > 0, 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-300)), 1.0)
    Ms = (s[:, None] * M * s[None, :]).astype(jnp.float32)
    f = _ldl.ldl_factor(Ms)
    ok = f.ok & ks_ok
    if count_inertia:
        ok = ok & (f.n_neg + n_neg_ks == mc + md)
    return MdsSaddleDeviceMpFactors(
        f.L, f.d, s, M, ks_inv, Js, Jdn, dd_tot, ok, f.n_neg + n_neg_ks
    )


def _mp_solve_refined(f: MdsSaddleDeviceMpFactors, rhs,
                      ir_tol: float = 1e-9, max_ir: int = 8):
    """Solve M x = rhs through the equilibrated f32 factors with f64
    iterative refinement. Returns (x, certified): `certified` is the
    f64 relative residual test ||rhs - M x|| <= ir_tol * (||rhs|| +
    ||M||_max ||x||), the on-device equivalent of the host tiers' FGMRES-IR
    certification (filter_ipm._maybe_refine)."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    n = rhs.shape[0]
    lf = _ldl.LdlFactors(f.L, f.d, n, jnp.asarray(0), f.ok)
    dt = rhs.dtype

    def solve32(r):
        y32 = _ldl.ldl_solve(lf, (f.s * r).astype(jnp.float32))
        return f.s * y32.astype(dt)

    m_norm = jnp.max(jnp.abs(f.M))
    b_norm = jnp.linalg.norm(rhs)

    def relres(x, r):
        return jnp.linalg.norm(r) / jnp.maximum(
            b_norm + m_norm * jnp.linalg.norm(x), 1e-300
        )

    x0 = solve32(rhs)
    r0 = rhs - f.M @ x0

    def cond(carry):
        k, x, r = carry
        return (relres(x, r) > ir_tol) & (k < max_ir)

    def body(carry):
        k, x, r = carry
        x = x + solve32(r)
        r = rhs - f.M @ x
        return k + 1, x, r

    _k, x, r = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), x0, r0))
    certified = (relres(x, r) <= ir_tol) & jnp.all(jnp.isfinite(x))
    return x, certified


def solve_saddle_device_mp(f: MdsSaddleDeviceMpFactors, rxs_t, rxd_t, rd_t,
                           ryc, ryd, ir_tol: float = 1e-9):
    """Direction recovery for :func:`factorize_saddle_device_mp` with IR
    certification; returns (dxs, dxd, dd, dyc, dyd, certified)."""
    nd = rxd_t.shape[0]
    mc = ryc.shape[0]
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    rhs_y = jnp.concatenate([ryc, ryd + dd_inv * rd_t]) - f.Js @ (f.ks_inv * rxs_t)
    rhs = jnp.concatenate([rxd_t, rhs_y])
    sol, certified = _mp_solve_refined(f, rhs, ir_tol=ir_tol)
    dxd = sol[:nd]
    dy = sol[nd:]
    dyc, dyd = dy[:mc], dy[mc:]
    dxs = f.ks_inv * (rxs_t - f.Js.T @ dy)
    dd = dd_inv * (rd_t + dyd)
    return dxs, dxd, dd, dyc, dyd, certified


def mds_js_struct(nlp):
    """Cached sparse-block triplet structure of an NlpMDS formulation for
    the operator-form mp path: (js_rows int32, js_cols int32, schur_pairs)
    with rows in the stacked [eq; m_eq + ineq] order, or None when the
    same-column pair structure is unavailable (build_schur_pairs declined).
    Cached on the formulation — both the fused builder and the memory
    estimator consult it."""
    import numpy as np

    cached = getattr(nlp, "_js_struct_cache", "miss")
    if cached != "miss":
        return cached
    sr = np.concatenate([
        np.asarray(nlp.jac_sp_eq_rows, dtype=np.int64),
        nlp.m_eq + np.asarray(nlp.jac_sp_in_rows, dtype=np.int64),
    ])
    sc = np.concatenate([
        np.asarray(nlp.jac_sp_eq_cols, dtype=np.int64),
        np.asarray(nlp.jac_sp_in_cols, dtype=np.int64),
    ])
    pairs = build_schur_pairs(sr, sc, nlp.n_sparse)
    out = None
    if pairs is not None:
        out = (
            jnp.asarray(sr.astype(np.int32)),
            jnp.asarray(sc.astype(np.int32)),
            pairs,
        )
    nlp._js_struct_cache = out
    return out


class MdsSaddleDeviceMpOpFactors(NamedTuple):
    """Memory-lean mixed-precision fused-path factors: like
    :class:`MdsSaddleDeviceMpFactors` but the f64 saddle is NEVER
    materialized — the iterative-refinement operator is kept in OPERATOR
    FORM from the original f64 operands (Kd, the dense border Jdn, the
    sparse-block TRIPLET values, the eliminated diagonal), exactly the
    reference's ReSolve IR design (matvecs against the original CSR
    operands, /root/reference/src/LinAlg/ReSolve/IterativeRefinement.hpp:25
    — never a second full-precision copy). Only the equilibrated f32
    saddle is ever dense, so the fused program's HBM footprint drops from
    ~20 bytes/entry of the saddle to ~8 (measured: B=2048 ACOPF went from
    34.8 GB — a compile OOM — to fitting one 15.75 GB chip), and each IR
    matvec costs O(nd^2 + m*nd + nnz) instead of the dense (nd+m)^2
    (measured 37 ms -> sub-ms at the B=512 shape).

    The triplet structure arrays (js_rows, js_cols, schur pairs) are
    trace-time constants closed over by the solve functions, not carry
    leaves. All leaves are arrays (lax.while_loop-safe)."""
    L: jax.Array        # f32 unit-lower LDL factor (padded)
    d: jax.Array        # f32 pivots (padded)
    s: jax.Array        # (nd+m,) f64 equilibration scale
    m_norm: jax.Array   # f64 scalar ~ max |M| (relres normalization)
    Kd: jax.Array       # (nd, nd) f64 dense block
    Jdn: jax.Array      # (m, nd) f64 dense border
    js_vals: jax.Array  # (nnz,) f64 sparse-block triplet values ([eq; ineq])
    diagC: jax.Array    # (m,) f64 diagonal of C beyond Js Ks^-1 Js^T
    ks_inv: jax.Array   # (n_s,) f64 signed inverse of the eliminated block
    dd_tot: jax.Array
    ok: jax.Array       # finite f32 factorization AND inertia == mc + md
    n_neg: jax.Array    # f32 pivot-sign negative count INCL. the eliminated
                        # diagonal (compare to mc + md); near-zero pivots
                        # make this noisy in f32 — callers may verify a
                        # mismatch with a lazy f64 factorization


def factorize_saddle_device_mp_op(
    hss, Hdd, Dxs, Dxd, Dd, Jc_d, Jd_d, js_vals, js_pairs,
    delta_wx, delta_wd, delta_cc, delta_cd, count_inertia: bool = True,
):
    """Traceable operator-form analogue of :func:`factorize_saddle_device_mp`:
    the C = Js Ks^{-1} Js^T block is assembled DIRECTLY IN f32 from the
    same-column triplet pairs (products computed in f64, scattered in f32 —
    the f64 operator stays in triplet form for IR), the saddle is
    equilibrated and factorized by the blocked no-pivot f32 LDL^T, and the
    factors carry the f64 operands instead of a dense f64 copy."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    mc, md = Jc_d.shape[0], Jd_d.shape[0]
    m = mc + md
    dt = Hdd.dtype
    tol_ks = 1e-14

    ks = hss + Dxs + delta_wx
    ks_ok = jnp.all(jnp.abs(ks) > tol_ks)
    n_neg_ks = jnp.sum(ks < -tol_ks)
    ks_inv = jnp.where(
        jnp.abs(ks) > tol_ks, 1.0 / jnp.where(ks == 0, 1.0, ks), 0.0
    )
    Jdn = jnp.concatenate([Jc_d, Jd_d], axis=0)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)
    diagC = jnp.concatenate([jnp.full((mc,), delta_cc, dt), dd_inv + delta_cd])
    Kd = Hdd + jnp.diag(Dxd + delta_wx)

    pa, pb, pvar, prow, pcol = js_pairs
    prod32 = (js_vals[pa] * js_vals[pb] * ks_inv[pvar]).astype(jnp.float32)
    C32 = (
        jnp.zeros((m * m,), jnp.float32)
        .at[prow * m + pcol].add(prod32)
        .reshape(m, m)
        + jnp.diag(diagC.astype(jnp.float32))
    )
    Ms = jnp.block([
        [Kd.astype(jnp.float32), Jdn.T.astype(jnp.float32)],
        [Jdn.astype(jnp.float32), -C32],
    ])
    rmax = jnp.max(jnp.abs(Ms), axis=1)
    s32 = jnp.where(rmax > 0, 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-30)), 1.0)
    f = _ldl.ldl_factor(s32[:, None] * Ms * s32[None, :])
    ok = f.ok & ks_ok
    if count_inertia:
        ok = ok & (f.n_neg + n_neg_ks == mc + md)
    return MdsSaddleDeviceMpOpFactors(
        f.L, f.d, s32.astype(dt), jnp.max(rmax).astype(dt),
        Kd, Jdn, js_vals, diagC, ks_inv, dd_tot, ok,
        f.n_neg + n_neg_ks,
    )


def _op_matvec(f: MdsSaddleDeviceMpOpFactors, js_rows, js_cols, v):
    """f64 saddle matvec in operator form:
    M [vd; vy] = [Kd vd + Jdn^T vy; Jdn vd - (Js Ks^{-1} Js^T + diagC) vy]
    with Js applied through its triplets (two scatter/gathers)."""
    nd = f.Kd.shape[0]
    vd, vy = v[:nd], v[nd:]
    top = f.Kd @ vd + f.Jdn.T @ vy
    jt = (
        jnp.zeros(f.ks_inv.shape, v.dtype)
        .at[js_cols].add(f.js_vals * vy[js_rows])
    )
    cy = (
        jnp.zeros(vy.shape, v.dtype)
        .at[js_rows].add(f.js_vals * (f.ks_inv * jt)[js_cols])
    )
    return jnp.concatenate([top, f.Jdn @ vd - cy - f.diagC * vy])


def _fgmres_y(H, beta, K):
    """Small-system solve of the GMRES least squares min ||beta e1 - H y||
    by regularized normal equations (H^T H + eps I) y = H^T beta e1 —
    zero columns (unbuilt iterations / breakdown) get y=0 through the
    regularization. A (K, K) Cholesky: cheap and TPU-friendly, unlike
    jnp.linalg.lstsq whose SVD is an iterative Jacobi on TPU."""
    dt = H.dtype
    e1 = jnp.zeros((H.shape[0],), dt).at[0].set(beta)
    G = H.T @ H
    g = H.T @ e1
    scale = jnp.maximum(jnp.max(jnp.abs(G)), 1e-300)
    G = G + (1e-14 * scale) * jnp.eye(K, dtype=dt)
    c = jax.scipy.linalg.cho_factor(G)
    return jax.scipy.linalg.cho_solve(c, g)


def _fgmres_device(matvec, precond, rhs, x0, K: int, tol_abs):
    """Early-exit flexible GMRES, fully traceable (the escalation stage of
    the on-device IR certification — invoked only when plain refinement
    fails, via lax.cond). CGS2 orthogonalization in a lax.while_loop that
    stops as soon as the projected residual |g_{j+1}| (tracked by Givens
    rotations) drops under ``tol_abs`` — unneeded iterations are never
    executed. Returns (x, n_iter)."""
    n = rhs.shape[0]
    dt = rhs.dtype
    r0 = rhs - matvec(x0)
    beta = jnp.linalg.norm(r0)
    V0 = jnp.zeros((K + 1, n), dt).at[0].set(r0 / jnp.maximum(beta, 1e-300))
    Z0 = jnp.zeros((K, n), dt)
    H0 = jnp.zeros((K + 1, K), dt)

    def cond(carry):
        _V, _Z, _H, j, res = carry
        return (res > tol_abs) & (j < K)

    def body(carry):
        V, Z, H, j, _res = carry
        z = precond(V[j])
        w = matvec(z)
        h1 = V @ w
        w = w - V.T @ h1
        h2 = V @ w
        w = w - V.T @ h2
        hn = jnp.linalg.norm(w)
        V = V.at[j + 1].set(w / jnp.maximum(hn, 1e-300))
        col = (h1 + h2).at[j + 1].add(hn)
        H = H.at[:, j].set(col)
        Z = Z.at[j].set(z)
        # projected residual |g_{j+1}| of min ||beta e1 - H y|| via the
        # tiny normal-equations solve (K x K ops — negligible next to the
        # matvec/trisolve above)
        y = _fgmres_y(H, beta, K)
        res = jnp.linalg.norm(
            jnp.zeros((K + 1,), dt).at[0].set(beta) - H @ y
        )
        return V, Z, H, j + 1, res

    _V, Z, H, n_it, _res = jax.lax.while_loop(
        cond, body, (V0, Z0, H0, jnp.asarray(0, jnp.int32), beta)
    )
    y = _fgmres_y(H, beta, K)
    return x0 + Z.T @ y, n_it


def _mp_solve_refined_op(f: MdsSaddleDeviceMpOpFactors, js_rows, js_cols, rhs,
                         ir_tol: float = 1e-9, max_ir: int = 4,
                         fgmres_k: int = 16):
    """Solve M x = rhs through the equilibrated f32 factors with f64
    OPERATOR-FORM iterative refinement, escalating to a fixed-K on-device
    FGMRES cycle (f32 solve as right preconditioner) when plain IR fails —
    the two-stage certification that keeps the factorization at working
    precision deep into the barrier trajectory (ReSolve's premise; raises
    the late-barrier f32 fraction that plain IR alone loses).
    Returns (x, certified, n_ir) where n_ir counts refinement steps
    (FGMRES counted as its K inner iterations).

    Certification normalizes by ||rhs|| ALONE — not the backward-error
    bound ||rhs|| + ||M|| ||x|| the dense-mp path used. With late-barrier
    diagonals ~1e9 the backward bound lets an absolute residual of order
    ||x|| 'certify' with zero refinement steps, and the resulting garbage
    directions blow up the dual infeasibility (observed at B=32, mu~2e-6:
    opt 1e-4 -> 28 in two accepted steps). Refinement matvecs are
    operator-form and near-free, so the strict test costs a few extra IR
    iterations exactly where they are needed."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    n = rhs.shape[0]
    lf = _ldl.LdlFactors(f.L, f.d, n, jnp.asarray(0), f.ok)
    dt = rhs.dtype

    def solve32(r):
        y32 = _ldl.ldl_solve(lf, (f.s * r).astype(jnp.float32))
        return f.s * y32.astype(dt)

    def matvec(v):
        return _op_matvec(f, js_rows, js_cols, v)

    b_norm = jnp.linalg.norm(rhs)

    def relres(x, r):
        return jnp.linalg.norm(r) / jnp.maximum(b_norm, 1e-300)

    x0 = solve32(rhs)
    r0 = rhs - matvec(x0)

    def cond(carry):
        k, x, r = carry
        return (relres(x, r) > ir_tol) & (k < max_ir)

    def body(carry):
        k, x, r = carry
        x = x + solve32(r)
        r = rhs - matvec(x)
        return k + 1, x, r

    k, x, r = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), x0, r0))
    plain_ok = (relres(x, r) <= ir_tol) & jnp.all(jnp.isfinite(x))

    if fgmres_k > 0:
        def escalate(x):
            x_f, n_f = _fgmres_device(
                matvec, solve32, rhs, x, fgmres_k, ir_tol * b_norm
            )
            # a diverged FGMRES (breakdown) must not replace a finite iterate
            return jnp.where(jnp.all(jnp.isfinite(x_f)), x_f, x), n_f

        x, n_f = jax.lax.cond(
            plain_ok,
            lambda x: (x, jnp.asarray(0, jnp.int32)),
            escalate, x,
        )
        r = jnp.where(plain_ok, r.astype(dt), rhs - matvec(x))
        k = k + n_f
    certified = (relres(x, r) <= ir_tol) & jnp.all(jnp.isfinite(x))
    return x, certified, k


def solve_saddle_device_mp_op(f: MdsSaddleDeviceMpOpFactors, js_rows, js_cols,
                              rxs_t, rxd_t, rd_t, ryc, ryd,
                              ir_tol: float = 1e-9, fgmres_k: int = 16):
    """Direction recovery for :func:`factorize_saddle_device_mp_op`; Js
    enters the rhs reduction and the x_s back-substitution through its
    triplets only. Returns (dxs, dxd, dd, dyc, dyd, certified, n_ir)."""
    nd = rxd_t.shape[0]
    mc = ryc.shape[0]
    m = f.Jdn.shape[0]
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    u = f.ks_inv * rxs_t
    js_u = jnp.zeros((m,), u.dtype).at[js_rows].add(f.js_vals * u[js_cols])
    rhs = jnp.concatenate([rxd_t, jnp.concatenate([ryc, ryd + dd_inv * rd_t]) - js_u])
    sol, certified, n_ir = _mp_solve_refined_op(
        f, js_rows, js_cols, rhs, ir_tol=ir_tol, fgmres_k=fgmres_k
    )
    dxd = sol[:nd]
    dy = sol[nd:]
    dyc, dyd = dy[:mc], dy[mc:]
    jst_dy = (
        jnp.zeros(f.ks_inv.shape, dy.dtype)
        .at[js_cols].add(f.js_vals * dy[js_rows])
    )
    dxs = f.ks_inv * (rxs_t - jst_dy)
    dd = dd_inv * (rd_t + dyd)
    return dxs, dxd, dd, dyc, dyd, certified, n_ir


class MdsSchurHostFactors(NamedTuple):
    """Bordered sparse safe-tier factors (host): the MDS saddle

      M = [ K_d    J_dn^T ]      N = -C,  C = Js Ks^{-1} Js^T (signed)
          [ J_dn   -C     ]               + blkdiag(delta_cc I, Dd_inv + delta_cd)

    is mostly SPARSE — C has the network-local pattern of same-column
    Jacobian nonzero pairs — with only an (m, n_d) dense border from the
    dense block. Factor N with the native inertia-reporting simplicial
    LDL^T (symbolic cached per pattern), Schur the n_d dense columns onto
    S_d = K_d - J_dn^T N^{-1} J_dn (tiny dense sym-indefinite, LAPACK
    sytrf), and combine inertias by Haynsworth additivity:
    n_neg(M) = n_neg(N) + n_neg(S_d). At the B=512 ACOPF shape this
    replaces a 4710^2 dense emulated-f64 LDL^T on device (measured
    29-66 s per factorization) with a ~ms-scale host factorization —
    the same structure exploitation as the reference's sparse MA57 safe
    path (hiopKKTLinSysSparse.cpp) rather than its dense MAGMA one."""
    fact: object          # NativeLdlFactorization of N = -C, or None
    sd_fact: object       # (ldu, ipiv) LAPACK sytrf factors of S_d
    W: object             # (m, n_d) = N^{-1} J_dn
    Jdn: object           # (m, n_d) np
    js_rows: object       # stacked triplet structure of Js (np int)
    js_cols: object
    js_vals: object       # np float64
    ks_inv: object        # (n_s,) np signed inverse
    dd_tot: object        # (m_ineq,) np
    nd: int
    mc: int
    md: int
    host: bool
    n_neg_eig: object     # n_neg(N) + n_neg(S_d) + n_neg(ks); -1 on breakdown
    ok: object


def _sytrf_inertia(ldu, ipiv):
    """(n_pos, n_neg, n_zero) from LAPACK sytrf factors (lower): 1x1 pivots
    by sign, 2x2 pivots (ipiv < 0) by det/trace of the block."""
    import numpy as np

    n = ldu.shape[0]
    d = np.diag(ldu)
    npos = nneg = nzero = 0
    k = 0
    while k < n:
        if ipiv[k] < 0:
            a11, a22, e = d[k], d[k + 1], ldu[k + 1, k]
            det = a11 * a22 - e * e
            if det < 0:
                npos += 1
                nneg += 1
            elif a11 + a22 > 0:
                npos += 2
            else:
                nneg += 2
            k += 2
        else:
            if d[k] > 0:
                npos += 1
            elif d[k] < 0:
                nneg += 1
            else:
                nzero += 1
            k += 1
    return npos, nneg, nzero


def factorize_safe_schur(
    hss, Hdd, Dxs, Dxd, Dd, Jdn, js_rows, js_cols, js_vals, js_pairs,
    delta_wx, delta_wd, delta_cc, delta_cd, mc: int, md: int,
):
    """Bordered sparse factorization of the MDS saddle (see
    :class:`MdsSchurHostFactors`). All inputs host-convertible; inertia
    acceptance and breakdown routing follow :func:`factorize_safe`'s
    conventions (n_neg_eig = -1 routes to the singularity handler)."""
    import numpy as np
    import scipy.sparse as sp

    from hiop_tpu.native.ldl import NativeLdlFactorization, SingularError
    from scipy.linalg import lapack as _lapack

    hss = np.asarray(hss, np.float64)
    Hdd = np.asarray(Hdd, np.float64)
    Dxs = np.asarray(Dxs, np.float64)
    Dxd = np.asarray(Dxd, np.float64)
    Dd = np.asarray(Dd, np.float64)
    Jdn = np.asarray(Jdn, np.float64)
    js_vals = np.asarray(js_vals, np.float64)
    m = mc + md
    nd = Hdd.shape[0]

    tol_ks = 1e-14
    ks = hss + Dxs + delta_wx
    n_zero_ks = int(np.sum(np.abs(ks) <= tol_ks))
    n_neg_ks = int(np.sum(ks < -tol_ks))
    ks_inv = np.where(np.abs(ks) > tol_ks, 1.0 / np.where(ks == 0, 1.0, ks), 0.0)
    dd_tot = Dd + delta_wd
    dd_inv = np.where(dd_tot > 0, 1.0 / np.maximum(dd_tot, 1e-300), 0.0)

    def fail(n_neg):
        # ok=True + n_neg_eig=-1: the strategy's acceptance test routes this
        # to the SINGULARITY handler (delta_cc bump) — a breakdown of the
        # sparse no-pivot LDL^T on N = -C most often means a rank-deficient
        # Schur block, not wrong curvature. fact=None can never be solved:
        # n_neg_eig=-1 != mc + md guarantees rejection before any solve.
        return MdsSchurHostFactors(
            None, None, None, Jdn, js_rows, js_cols, js_vals, ks_inv,
            dd_tot, nd, mc, md, True, n_neg, True,
        )

    if n_zero_ks > 0:
        return fail(-1)

    # N = -C sparse: pairwise JKJt entries + the diagonal block
    pa, pb, pvar, prow, pcol = (np.asarray(a) for a in js_pairs)
    vals = -(js_vals[pa] * js_vals[pb] * ks_inv[pvar])
    diag = -np.concatenate(
        [np.full(mc, delta_cc), dd_inv + delta_cd]
    )
    rows = np.concatenate([prow, np.arange(m)])
    cols = np.concatenate([pcol, np.arange(m)])
    N = sp.coo_matrix(
        (np.concatenate([vals, diag]), (rows, cols)), shape=(m, m)
    ).tocsc()
    try:
        nf = NativeLdlFactorization(N, ordering="amd")
    except (SingularError, RuntimeError):
        return fail(-1)
    _, n_neg_N, n_zero_N = nf.inertia()
    if n_zero_N > 0:
        return fail(-1)

    W = nf.solve(Jdn) if nd else np.zeros((m, 0))
    Kd = Hdd + np.diag(Dxd + delta_wx)
    Sd = Kd - Jdn.T @ W
    if nd:
        ldu, ipiv, info = _lapack.dsytrf(Sd, lower=1)
        if info != 0 or not np.all(np.isfinite(ldu)):
            return fail(-1)
        _, n_neg_Sd, n_zero_Sd = _sytrf_inertia(ldu, ipiv)
        if n_zero_Sd > 0:
            return fail(-1)
        sd_fact = (ldu, ipiv)
    else:
        sd_fact = None
        n_neg_Sd = 0

    n_neg = n_neg_N + n_neg_Sd + n_neg_ks
    return MdsSchurHostFactors(
        nf, sd_fact, W, Jdn, js_rows, js_cols, js_vals, ks_inv,
        dd_tot, nd, mc, md, True, n_neg, True,
    )


def solve_safe_schur(f: MdsSchurHostFactors, rxs_t, rxd_t, rd_t, ryc, ryd):
    """Direction recovery for :func:`factorize_safe_schur` (host numpy;
    Js enters only through triplet matvecs — no dense (m, n_s) product)."""
    import numpy as np
    from scipy.linalg import lapack as _lapack

    rxs = np.asarray(rxs_t, np.float64)
    rxd = np.asarray(rxd_t, np.float64)
    rd = np.asarray(rd_t, np.float64)
    ryc = np.asarray(ryc, np.float64)
    ryd = np.asarray(ryd, np.float64)
    m = f.mc + f.md
    dd_inv = np.where(f.dd_tot > 0, 1.0 / np.maximum(f.dd_tot, 1e-300), 0.0)

    ks_rxs = f.ks_inv * rxs
    js_ksr = np.zeros(m)
    np.add.at(js_ksr, f.js_rows, f.js_vals * ks_rxs[f.js_cols])
    r2 = np.concatenate([ryc, ryd + dd_inv * rd]) - js_ksr

    t = f.fact.solve(r2)
    if f.nd:
        rhs_d = rxd - f.Jdn.T @ t
        dxd, _ = _lapack.dsytrs(f.sd_fact[0], f.sd_fact[1], rhs_d, lower=1)
        dy = t - f.W @ dxd
    else:
        dxd = rxd[:0]
        dy = t
    jst_dy = np.zeros(f.ks_inv.shape[0])
    np.add.at(jst_dy, f.js_cols, f.js_vals * dy[f.js_rows])
    dxs = f.ks_inv * (rxs - jst_dy)
    dyc, dyd = dy[: f.mc], dy[f.mc:]
    dd = dd_inv * (rd + dyd)
    return (
        jnp.asarray(dxs), jnp.asarray(dxd), jnp.asarray(dd),
        jnp.asarray(dyc), jnp.asarray(dyd),
    )


class MdsSafeFactors(NamedTuple):
    """Safe-tier factors: the sparse diag block stays eliminated (exact),
    but the dense block is NOT reduced to an SPD Schur complement — the
    (n_d + m) symmetric-indefinite saddle system is factorized with an
    inertia-revealing method, like the reference's MAGMA-BuKa escalation
    for MDS systems (hiopKKTLinSysMDS.cpp:437-477)."""
    fact: object        # LdlFactors (device) or (lu, piv) host pair
    host: bool
    ks_inv: jax.Array
    Js: jax.Array
    dd_tot: jax.Array
    nd: int
    mc: int
    md: int
    n_neg_eig: object   # int/array; -1 on breakdown
    ok: object


def factorize_safe(
    hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d,
    delta_wx, delta_wd, delta_cc, delta_cd, host: bool = False,
    js_vals=None, js_pairs=None,
):
    """Assemble and factorize the reduced MDS saddle system

      [ K_d    J_dn^T ] [dx_d]   [ rx_d                        ]
      [ J_dn   -C     ] [ dy ] = [ [ryc; ryd + Dd^{-1} rd] - J_s K_s^{-1} rx_s ]

    with K_s eliminated exactly (diagonal) and
    C = J_s K_s^{-1} J_s^T + blkdiag(delta_cc I, (Dd+delta_wd)^{-1} + delta_cd I).
    Expected inertia (n_d, m_c + m_d, 0). ``host=True`` uses scipy LU +
    eigen inertia (the LAPACK fallback); otherwise the blocked no-pivot
    LDL^T runs on device with inertia from the pivot signs."""
    nd = Hdd.shape[0]
    mc, md = Jc_s.shape[0], Jd_s.shape[0]
    dt = Hdd.dtype

    ks = hss + Dxs + delta_wx
    # an INDEFINITE diagonal sparse block is eliminated exactly with its
    # signed inverse; by Haynsworth inertia additivity its negative entries
    # count toward the system's negative eigenvalues (the reference counts
    # them with numOfElemsLessThan and only treats NULL entries as a
    # breakdown, hiopKKTLinSysMDS.cpp:85-96) — requiring ks > 0 here would
    # force delta_wx >= |min ks| and re-create the quick tier's chronic
    # over-regularization on structurally indefinite problems
    tol_ks = 1e-14
    n_zero_ks = int(jnp.sum(jnp.abs(ks) <= tol_ks))
    n_neg_ks = int(jnp.sum(ks < -tol_ks))
    ks_inv = jnp.where(jnp.abs(ks) > tol_ks, 1.0 / jnp.where(ks == 0, 1.0, ks), 0.0)
    Js = jnp.concatenate([Jc_s, Jd_s], axis=0)
    Jdn = jnp.concatenate([Jc_d, Jd_d], axis=0)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)

    Kd = Hdd + jnp.diag(Dxd + delta_wx)
    # triplet Schur assembly when the pair structure is available: O(sum
    # deg^2) scatter instead of the dense (m, ns) @ (ns, m) product, which
    # at B=2048 ACOPF scale is 1.4e16 FLOPs and would bury the safe tier
    if js_pairs is not None and js_vals is not None:
        JKJt = schur_js_triplets(js_vals, ks_inv, js_pairs, mc + md)
    else:
        JKJt = (Js * ks_inv) @ Js.T
    C = JKJt + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, dt), dd_inv + delta_cd])
    )
    M = jnp.block([[Kd, Jdn.T], [Jdn, -C]])

    if n_zero_ks > 0:
        # null eigenvalues in the (1,1) sparse block: singular
        # (n_neg_eig_11 = -1 in the reference, hiopKKTLinSysMDS.cpp:93-96)
        return MdsSafeFactors(
            None, host, ks_inv, Js, dd_tot, nd, mc, md, -1, False
        )
    if host:
        from hiop_tpu.kkt.newton_dense import _lu_with_inertia

        lu, piv, n_neg = _lu_with_inertia(M, delta_cc)
        import numpy as _np

        ok = bool(_np.all(_np.isfinite(lu)))
        return MdsSafeFactors(
            (lu, piv), True, ks_inv, Js, dd_tot, nd, mc, md,
            int(n_neg) + n_neg_ks if n_neg >= 0 else -1, ok
        )
    from hiop_tpu.linalg import ldl_blocked as _ldl

    f = _ldl.ldl_factor(M)
    n_neg = int(f.n_neg) + n_neg_ks if bool(f.ok) else -1
    return MdsSafeFactors(
        f, False, ks_inv, Js, dd_tot, nd, mc, md, n_neg, bool(f.ok)
    )


def solve_safe(f: MdsSafeFactors, rxs_t, rxd_t, rd_t, ryc, ryd):
    nd, mc, md = f.nd, f.mc, f.md
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    Ksinv_rxs = f.ks_inv * rxs_t
    rhs2 = jnp.concatenate([ryc, ryd + dd_inv * rd_t]) - f.Js @ Ksinv_rxs
    rhs = jnp.concatenate([rxd_t, rhs2])
    if f.host:
        import numpy as _np
        import scipy.linalg as _sla

        sol = jnp.asarray(_sla.lu_solve(f.fact, _np.asarray(rhs)))
    else:
        from hiop_tpu.linalg import ldl_blocked as _ldl

        sol = _ldl.ldl_solve(f.fact, rhs)
    dxd = sol[:nd]
    dy = sol[nd:]
    dyc, dyd = dy[:mc], dy[mc:]
    dxs = f.ks_inv * (rxs_t - f.Js.T @ dy)
    dd = dd_inv * (rd_t + dyd)
    return dxs, dxd, dd, dyc, dyd


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
