"""ACOPF-class driver tests: the north-star MDS shape (BASELINE.json) plus
the chronic-regularization escalation it motivated."""

import numpy as np
import pytest

import examples.acopf_mds as am
from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions, NlpSparse


def _rel(a, b):
    return abs(a - b) / max(1.0, abs(b))


def test_acopf_derivatives_consistent_with_ad():
    """Analytic triplet Jacobian/diagonal Hessian match autodiff of the
    eval functions (guards the diagonalized-reformulation algebra)."""
    import jax
    import jax.numpy as jnp

    p = am.AcopfSparse(8)
    n, m = p.get_prob_sizes()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n) * 0.3 + 1.0)
    lam = jnp.asarray(rng.standard_normal(m))
    J_ad = np.asarray(jax.jacfwd(p.eval_cons)(x))
    jr, jc = p.jac_structure()
    J_an = np.zeros((m, n))
    np.add.at(J_an, (np.asarray(jr), np.asarray(jc)), np.asarray(p.eval_jac_vals(x)))
    assert np.abs(J_an - J_ad).max() < 1e-12
    H_ad = np.asarray(jax.hessian(lambda z: p.eval_f(z) + lam @ p.eval_cons(z))(x))
    hr, hc = p.hess_structure()
    H_an = np.zeros((n, n))
    np.add.at(H_an, (np.asarray(hr), np.asarray(hc)),
              np.asarray(p.eval_hess_vals(x, 1.0, lam)))
    H_full = H_an + H_an.T - np.diag(np.diag(H_an))
    assert np.abs(H_full - H_ad).max() < 1e-12


def test_acopf_mds_vs_sparse_cross_check():
    """The MDS and fully-sparse formulations of the same grid agree (the
    reference's MDS-vs-dense iteration-equivalence technique)."""
    r_mds = am.solve(16, sparse=False, verbosity_level=0)
    r_sp = am.solve(16, sparse=True, verbosity_level=0)
    assert r_mds.status.is_success and r_sp.status.is_success
    assert _rel(r_mds.obj, r_sp.obj) < 1e-7


def test_acopf_selfcheck_objective():
    ref, tol = am.SELFCHECK[32]
    r = am.solve(32, verbosity_level=0)
    assert r.status.is_success
    assert _rel(r.obj, ref) < tol
    # the structurally indefinite Hessian must NOT force hundreds of
    # damped-gradient iterations (1074 before the chronic-regularization
    # escalation + Haynsworth MDS inertia fixes)
    assert r.iterations < 120


def test_chronic_regularization_escalates_to_safe_tier():
    """A quick tier that only passes with persistent delta_w hands over to
    the inertia-revealing safe tier after a few iterations."""
    import hiop_tpu.optimization.filter_ipm as fi

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0, max_iter=300)
    nlp = NlpMDS(am.AcopfMds(16), o)
    solver = FilterIPMNewton(nlp)
    r = solver.run()
    assert r.status.is_success
    assert r.iterations < 120


def test_chronic_escalation_respects_forcequick():
    """linsol_mode=forcequick pins the quick tier (reference semantics), so
    the solver keeps the Cholesky path and pays the damped iterations."""
    import hiop_tpu.optimization.filter_ipm as fi

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0, max_iter=30, linsol_mode="forcequick")
    nlp = NlpSparse(am.AcopfSparse(16), o)
    strat_holder = {}
    orig = fi.FilterIPMNewton._make_strategy

    def spy(self):
        s = orig(self)
        strat_holder["s"] = s
        return s

    fi.FilterIPMNewton._make_strategy = spy
    try:
        FilterIPMNewton(nlp).run()
    finally:
        fi.FilterIPMNewton._make_strategy = orig
    assert strat_holder["s"]._safe_mode == 0


def test_schur_js_triplets_matches_dense():
    """Triplet Schur assembly (the addMDinv* kernel analogue) equals the
    dense (Js * ks_inv) @ Js.T product, including signed ks_inv; duplicate
    structure entries force the dense fallback."""
    import jax.numpy as jnp
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(0)
    m, ns, nnz = 40, 120, 300
    rc = rng.choice(m * ns, nnz, replace=False)
    rows, cols = rc // ns, rc % ns
    vals = rng.standard_normal(nnz)
    ksinv = rng.uniform(0.5, 2.0, ns) * np.sign(rng.standard_normal(ns))
    Js = np.zeros((m, ns))
    Js[rows, cols] = vals
    ref = (Js * ksinv) @ Js.T
    pairs = kkt_mds.build_schur_pairs(rows, cols, ns)
    out = kkt_mds.schur_js_triplets(
        jnp.asarray(vals), jnp.asarray(ksinv), pairs, m
    )
    assert np.abs(np.asarray(out) - ref).max() < 1e-12
    # duplicates would be double counted -> builder must decline
    rows2 = np.concatenate([rows, rows[:1]])
    cols2 = np.concatenate([cols, cols[:1]])
    assert kkt_mds.build_schur_pairs(rows2, cols2, ns) is None
    # pair-count cap -> dense fallback
    assert kkt_mds.build_schur_pairs(rows, cols, ns, max_pairs=10) is None


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_acopf_fuzz_random_grids(seed):
    """Randomized grids (loads, admittances, cost coupling, participation
    all seeded) solve on both formulations to the same objective — the
    ACOPF analogue of the repo's randomized QP fuzz tiers."""
    n_bus = int(np.random.default_rng(seed).integers(8, 28)) // 4 * 4
    r_mds = am.solve(n_bus, sparse=False, seed=seed, verbosity_level=0,
                     max_iter=300)
    r_sp = am.solve(n_bus, sparse=True, seed=seed, verbosity_level=0,
                    max_iter=300)
    assert r_mds.status.is_success, (seed, n_bus, r_mds.status)
    assert r_sp.status.is_success, (seed, n_bus, r_sp.status)
    assert _rel(r_mds.obj, r_sp.obj) < 1e-6, (seed, n_bus)


def test_fused_mds_ldl_inertia_path():
    """jit_mode=solve with linear_solver_dense=ldl_nopiv runs the
    inertia-revealing blocked LDL^T INSIDE the fused program
    (fused_newton _FusedLdlFactors / kkt.mds.factorize_saddle_device):
    the structurally indefinite ACOPF MDS instance converges to the host
    objective in a comparable iteration count, where the fused Cholesky
    ladder creeps past max_iter."""
    r_host = am.solve(16, sparse=False, verbosity_level=0)
    r_fused = am.solve(16, sparse=False, verbosity_level=0, jit_mode="solve",
                       linear_solver_dense="ldl_nopiv", max_iter=300)
    assert r_fused.status.is_success
    assert _rel(r_fused.obj, r_host.obj) < 1e-7
    assert r_fused.iterations < 120


def test_sc_acopf_contingency_batch():
    """The N-1 contingency family solves as ONE vmapped fused device
    program (ParametricMdsNlp over AcopfContingencyMds with the on-device
    LDL inertia ladder); scenario 1's objective matches a host solve of
    the outaged grid."""
    import jax.numpy as jnp
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions

    res, lines = am.solve_contingencies(16, 3, max_iter=300)
    assert all(s.is_success for s in res.status)
    prob = am.AcopfContingencyMds(16)
    th = prob.contingency_params([lines[1]])
    p2 = am.AcopfMds(16)
    p2.core._gv = jnp.asarray(th["gv"][0])
    p2.core._bv = jnp.asarray(th["bv"][0])
    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0)
    r = FilterIPMNewton(NlpMDS(p2, o)).run()
    assert r.status.is_success
    assert _rel(res.obj[1], r.obj) < 1e-6


def test_pridec_sc_acopf():
    """Two-stage SC-ACOPF through the PriDec interface: master basecase
    dispatch + batched contingency re-dispatch recourse (the reference's
    flagship PriDec workload as one vmapped device program per outer
    iteration, with per-scenario host fallback)."""
    import examples.acopf_pridec as ap

    r = ap.solve(16, 3, verbosity_level=0, max_iter=25)
    assert r.status.name in ("Solve_Success", "Solve_Acceptable_Level")
    assert np.isfinite(r.obj)
    assert r.convergence < 1e-4


def test_saddle_device_matches_host_safe():
    """factorize/solve_saddle_device (the fused inertia realization) agree
    with the host safe tier on a random indefinite MDS system."""
    import jax.numpy as jnp
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(5)
    ns, nd, mc, md = 24, 6, 10, 4
    hss = jnp.asarray(rng.standard_normal(ns))          # indefinite diagonal
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + nd * np.eye(nd))
    Dxs = jnp.asarray(rng.uniform(0.1, 1.0, ns))
    Dxd = jnp.asarray(rng.uniform(0.1, 1.0, nd))
    Dd = jnp.asarray(rng.uniform(0.5, 2.0, md))
    Jc_s = jnp.asarray(rng.standard_normal((mc, ns)))
    Jc_d = jnp.asarray(rng.standard_normal((mc, nd)))
    Jd_s = jnp.asarray(rng.standard_normal((md, ns)))
    Jd_d = jnp.asarray(rng.standard_normal((md, nd)))
    args = (hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d, 0.0, 0.0, 1e-8, 1e-8)
    fd = kkt_mds.factorize_saddle_device(*args)
    fh = kkt_mds.factorize_safe(*args, host=True)
    assert bool(fh.ok)
    rxs = jnp.asarray(rng.standard_normal(ns))
    rxd = jnp.asarray(rng.standard_normal(nd))
    rd = jnp.asarray(rng.standard_normal(md))
    ryc = jnp.asarray(rng.standard_normal(mc))
    ryd = jnp.asarray(rng.standard_normal(md))
    out_d = kkt_mds.solve_saddle_device(fd, rxs, rxd, rd, ryc, ryd)
    out_h = kkt_mds.solve_safe(fh, rxs, rxd, rd, ryc, ryd)
    for a, b in zip(out_d, out_h):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-8)
    # inertia agreement (pivot signs + Haynsworth vs eig count)
    exp = mc + md
    if bool(fd.ok):
        assert int(fh.n_neg_eig) == exp


def test_pridec_sc_acopf_matches_extensive_form():
    """The PriDec two-stage solution equals the extensive-form optimum
    (all scenarios + basecase as ONE joint NLP solved through the
    autodiff/dense path) — the strongest PriDec correctness check
    (measured agreement 8.6e-8 relative at B=8, S=2)."""
    import jax.numpy as jnp
    import examples.acopf_pridec as ap
    from hiop_tpu import (AutoDiffNlpProblem, FilterIPMNewton,
                          NlpDenseConstraints, NlpOptions)

    B, S, seed = 8, 2, 0
    pd = ap.AcopfPriDec(B, S, seed)
    r_pd = ap.solve(B, S, seed, verbosity_level=0, max_iter=30)
    assert r_pd.status.name in ("Solve_Success", "Solve_Acceptable_Level")

    core = pd.rec.core
    nsp, ng = core.n_sp, core.ng
    blk = nsp + ng
    ths = [dict(gv=pd._th_gb["gv"][k], bv=pd._th_gb["bv"][k]) for k in range(S)]
    rho = ap.RHO_TRACK

    def split_all(X):
        segs = [X[i * blk:(i + 1) * blk] for i in range(S + 1)]
        return [(s[:nsp], s[nsp:]) for s in segs]

    def f_ext(X):
        (z0, g0), *scen = split_all(X)
        tot = core.obj_sparse(z0) + core.obj_dense(g0)
        for zk, gk in scen:
            tot = tot + (core.obj_sparse(zk) + core.obj_dense(gk)
                         + 0.5 * rho * jnp.sum((gk - g0) ** 2)) / S
        return tot

    def c_ext(X):
        (z0, g0), *scen = split_all(X)
        parts = [core.cons_all(z0, g0)]
        for k, (zk, gk) in enumerate(scen):
            parts.append(core.cons_all(zk, gk, ths[k]))
        return jnp.concatenate(parts)

    xl1, xu1 = core.var_bounds_sparse()
    gl, gu = np.zeros(ng), np.asarray(core.gd["g_max"])
    xl = np.tile(np.concatenate([xl1, gl]), S + 1)
    xu = np.tile(np.concatenate([xu1, gu]), S + 1)
    cl1, cu1 = core.cons_bounds()
    x01 = np.concatenate([core.start_sparse(), core.start_dense()])
    p = AutoDiffNlpProblem(
        f=f_ext, c=c_ext, xl=xl, xu=xu,
        cl=np.tile(cl1, S + 1), cu=np.tile(cu1, S + 1),
        x0=np.tile(x01, S + 1),
    )
    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0, max_iter=500)
    r_ext = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
    assert r_ext.status.is_success
    assert _rel(r_pd.obj, r_ext.obj) < 1e-5


def _random_mds_saddle(seed=7, ns=24, nd=6, mc=10, md=4, sparsity=0.35):
    """Random indefinite MDS saddle with a SPARSE Js given in triplet form
    (so both the bordered-sparse and dense safe tiers can factorize it)."""
    import jax.numpy as jnp
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(seed)
    hss = rng.standard_normal(ns)                      # indefinite diagonal
    A = rng.standard_normal((nd, nd))
    Hdd = A @ A.T + nd * np.eye(nd)
    Dxs = rng.uniform(0.1, 1.0, ns)
    Dxd = rng.uniform(0.1, 1.0, nd)
    Dd = rng.uniform(0.5, 2.0, md)
    m = mc + md
    mask = rng.uniform(size=(m, ns)) < sparsity
    # make sure every row/col of Js has an entry (well-posed Schur pattern)
    mask[np.arange(m), rng.integers(0, ns, m)] = True
    Js = np.where(mask, rng.standard_normal((m, ns)), 0.0)
    rows, cols = np.nonzero(Js)
    vals = Js[rows, cols]
    Jdn = rng.standard_normal((m, nd))
    pairs = kkt_mds.build_schur_pairs(rows, cols, ns)
    assert pairs is not None
    j = lambda a: jnp.asarray(a)
    dense_args = (
        j(hss), j(Hdd), j(Dxs), j(Dxd), j(Dd),
        j(Js[:mc]), j(Jdn[:mc]), j(Js[mc:]), j(Jdn[mc:]),
    )
    schur_args = (hss, Hdd, Dxs, Dxd, Dd, Jdn, rows, cols, vals, pairs)
    return dense_args, schur_args, (ns, nd, mc, md)


@pytest.mark.parametrize("deltas", [(0.0, 0.0, 1e-8, 1e-8), (0.5, 0.1, 0.0, 0.0)])
def test_safe_schur_matches_safe(deltas):
    """factorize_safe_schur (bordered sparse LDL^T + dense Schur border)
    agrees with factorize_safe (host LU + eig inertia) on inertia count and
    directions for a random indefinite MDS saddle, across regularizations."""
    import jax.numpy as jnp
    from hiop_tpu.kkt import mds as kkt_mds
    from hiop_tpu.native.ldl import native_available

    if not native_available():
        pytest.skip("native C++ LDL helper unavailable")
    dense_args, schur_args, (ns, nd, mc, md) = _random_mds_saddle()
    fh = kkt_mds.factorize_safe(*dense_args, *deltas, host=True)
    fs = kkt_mds.factorize_safe_schur(*schur_args, *deltas, mc=mc, md=md)
    assert bool(fh.ok) and bool(fs.ok)
    assert int(fs.n_neg_eig) == int(fh.n_neg_eig)
    rng = np.random.default_rng(11)
    j = lambda a: jnp.asarray(a)
    rxs, rxd = j(rng.standard_normal(ns)), j(rng.standard_normal(nd))
    rd, ryc, ryd = (j(rng.standard_normal(k)) for k in (md, mc, md))
    out_h = kkt_mds.solve_safe(fh, rxs, rxd, rd, ryc, ryd)
    out_s = kkt_mds.solve_safe_schur(fs, rxs, rxd, rd, ryc, ryd)
    for a, b in zip(out_s, out_h):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-9)


def test_safe_schur_breakdown_routes_to_singularity_handler():
    """A zero entry in the eliminated diagonal block must surface as
    n_neg_eig = -1 (the singularity route: delta_cc bump), never a solve."""
    from hiop_tpu.kkt import mds as kkt_mds
    from hiop_tpu.native.ldl import native_available

    if not native_available():
        pytest.skip("native C++ LDL helper unavailable")
    dense_args, schur_args, (ns, nd, mc, md) = _random_mds_saddle(seed=9)
    hss = np.array(schur_args[0])
    hss[3] = -float(schur_args[2][3])  # ks[3] = hss + Dxs + 0 == 0
    schur_args = (hss,) + schur_args[1:]
    fs = kkt_mds.factorize_safe_schur(*schur_args, 0.0, 0.0, 0.0, 0.0, mc=mc, md=md)
    assert int(fs.n_neg_eig) == -1
    assert fs.fact is None  # unsolvable sentinel: acceptance must reject it


def test_acopf_solve_forced_through_safe_schur_tier():
    """End-to-end ACOPF solve with the strategy pinned to the
    schur_sparse_ldl safe tier from iteration 0: converges to the same
    objective as the default-ladder solve."""
    import hiop_tpu.optimization.filter_ipm as fi
    from hiop_tpu.native.ldl import native_available

    if not native_available():
        pytest.skip("native C++ LDL helper unavailable")
    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0, max_iter=300)
    nlp = NlpMDS(am.AcopfMds(16), o)
    solver = FilterIPMNewton(nlp)
    orig = fi.FilterIPMNewton._make_strategy
    used = {}

    def pin(self):
        s = orig(self)
        assert s._safe_tiers[0] == "schur_sparse_ldl"
        s._safe_mode = 1  # pin: every factorization goes through the tier
        orig_fact = s._factorize

        def spy():
            f = orig_fact()
            used.setdefault("factors", set()).add(type(f).__name__)
            return f

        s._factorize = spy
        used["strategy"] = s
        return s

    fi.FilterIPMNewton._make_strategy = pin
    try:
        r = solver.run()
    finally:
        fi.FilterIPMNewton._make_strategy = orig
    assert "MdsSchurHostFactors" in used["factors"]
    assert r.status.is_success
    r_ref = am.solve(16, sparse=False, verbosity_level=0)
    assert _rel(r.obj, r_ref.obj) < 1e-6


@pytest.mark.slow
def test_acopf_b256_mds_twin_cross_check():
    """Round-5 SELFCHECK anchors: the B=256 MDS fused mixed-precision solve
    and the f64 host sparse twin must both converge to the recorded
    objective (the reference's MDS-vs-other-formulation equivalence
    technique at the production scale family)."""
    ref, tol = am.SELFCHECK[256]

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0, kkt_fact_dtype="float32",
        mp_schedule="adaptive", linear_solver_dense="ldl_nopiv",
        jit_mode="solve", max_iter=600,
    )
    nlp = NlpMDS(am.AcopfMds(256), o)
    r_mds = FilterIPMNewton(nlp).run()
    assert r_mds.status.is_success
    assert _rel(r_mds.obj, ref) < tol

    o2 = NlpOptions()
    o2.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0,
    )
    r_sp = FilterIPMNewton(NlpSparse(am.AcopfSparse(256), o2)).run()
    assert r_sp.status.is_success
    assert _rel(r_sp.obj, ref) < tol
    assert _rel(r_mds.obj, r_sp.obj) < tol
