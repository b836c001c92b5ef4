"""Randomized problem fuzzing: seeded synthetic NLPs solved by the Newton
IPM and cross-checked against scipy (convex cases) or first-order KKT
conditions (nonconvex cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytest.importorskip("scipy")

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    FilterIPMQuasiNewton,
    NlpDenseConstraints,
    NlpOptions,
)
from hiop_tpu.interface.base import INF
from hiop_tpu.utils.scipy_adapter import solve_with_scipy


def _random_convex_qp(seed, n=12, m=5):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    Q = jnp.asarray(A @ A.T / n + np.eye(n))
    q = jnp.asarray(rng.standard_normal(n))
    G = jnp.asarray(rng.standard_normal((m, n)))
    cl = np.full(m, -INF)
    cu = rng.uniform(0.5, 2.0, m)
    xl = np.where(rng.random(n) < 0.5, rng.uniform(-2, -0.5, n), -INF)
    xu = np.where(rng.random(n) < 0.5, rng.uniform(0.5, 2.0, n), INF)
    return AutoDiffNlpProblem(
        f=lambda x: 0.5 * x @ (Q @ x) + q @ x,
        c=lambda x: G @ x,
        xl=xl, xu=xu, cl=cl, cu=cu,
        x0=np.clip(np.zeros(n), np.where(xl <= -INF, -1, xl), np.where(xu >= INF, 1, xu)),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_convex_qp_matches_scipy(seed):
    p = _random_convex_qp(seed)
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0)
    r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
    assert r.status.is_success
    s = solve_with_scipy(p, maxiter=2000)
    assert abs(r.obj - s.fun) < 1e-5 * (1 + abs(s.fun))


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_random_nonconvex_kkt_satisfied(seed):
    """Nonconvex objective: scipy may find a different local minimum, so
    verify our own first-order conditions instead."""
    rng = np.random.default_rng(seed)
    n, m = 10, 4
    A = rng.standard_normal((n, n))
    Q = jnp.asarray((A + A.T) / 2)  # indefinite
    G = jnp.asarray(rng.standard_normal((m, n)))
    cu = rng.uniform(1.0, 3.0, m)
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * x @ (Q @ x) + 0.1 * jnp.sum(x**4),
        c=lambda x: G @ x,
        xl=-2 * np.ones(n), xu=2 * np.ones(n),
        cl=np.full(m, -INF), cu=cu,
        x0=0.1 * np.ones(n),
    )
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0, max_iter=300)
    r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
    assert r.status.is_success
    assert r.err_nlp <= 1e-6
    # feasibility of the returned point
    gx = np.asarray(G @ jnp.asarray(r.x))
    assert np.all(gx <= cu + 1e-6)
    assert np.all(r.x >= -2 - 1e-6) and np.all(r.x <= 2 + 1e-6)


@pytest.mark.parametrize("seed", [20, 21])
def test_random_qp_quasinewton_agrees_with_newton(seed):
    p = _random_convex_qp(seed, n=16, m=3)
    o1 = NlpOptions()
    o1.update(verbosity_level=0)
    r_qn = FilterIPMQuasiNewton(NlpDenseConstraints(p, o1)).run()
    o2 = NlpOptions()
    o2.update(Hessian="analytical_exact", verbosity_level=0)
    r_nt = FilterIPMNewton(NlpDenseConstraints(p, o2)).run()
    assert r_qn.status.is_success and r_nt.status.is_success
    assert abs(r_qn.obj - r_nt.obj) < 1e-6 * (1 + abs(r_nt.obj))


def _random_mds_qp(seed, ns=10, nd=6, m=4):
    """Random MDS QP: diagonal sparse-block Hessian, PD dense block, a
    random sparse-triplet Jacobian + dense block. Returns (MdsProblem,
    equivalent flat AutoDiffNlpProblem)."""
    from hiop_tpu.interface.base import MdsProblem

    rng = np.random.default_rng(1000 + seed)
    hss = rng.uniform(0.5, 2.0, ns)
    G = rng.standard_normal((nd, nd))
    Hdd = G @ G.T / nd + np.eye(nd)
    qs = rng.standard_normal(ns)
    qd = rng.standard_normal(nd)
    # 3 sparse entries per constraint row
    jr = np.repeat(np.arange(m), 3)
    jc = rng.integers(0, ns, 3 * m)
    jv = rng.standard_normal(3 * m)
    Jd_blk = rng.standard_normal((m, nd))
    cl = np.where(rng.random(m) < 0.4, rng.uniform(-1, 0, m), -INF)
    cu = rng.uniform(0.2, 1.5, m)
    xl = np.concatenate([np.full(ns, -3.0), np.full(nd, -INF)])
    xu = np.concatenate([np.full(ns, 3.0), np.full(nd, INF)])
    x0 = np.zeros(ns + nd)
    hss_j, Hdd_j = jnp.asarray(hss), jnp.asarray(Hdd)
    qs_j, qd_j = jnp.asarray(qs), jnp.asarray(qd)
    jv_j, Jd_j = jnp.asarray(jv), jnp.asarray(Jd_blk)

    def f(z):
        xs, xd = z[:ns], z[ns:]
        return (
            0.5 * jnp.sum(hss_j * xs * xs) + qs_j @ xs
            + 0.5 * xd @ (Hdd_j @ xd) + qd_j @ xd
        )

    def cons(z):
        xs, xd = z[:ns], z[ns:]
        c = jnp.zeros((m,), z.dtype)
        c = c.at[jr].add(jv_j * xs[jc])
        return c + Jd_j @ xd

    class _RandMds(MdsProblem):
        jittable = True

        def get_prob_sizes(self):
            return ns + nd, m

        def get_sparse_dense_blocks_info(self):
            return ns, nd

        def get_vars_info(self):
            return xl, xu

        def get_cons_info(self):
            return cl, cu

        def get_starting_point(self):
            return x0

        def eval_f(self, z):
            return f(z)

        def eval_grad_f(self, z):
            xs, xd = z[:ns], z[ns:]
            return jnp.concatenate([hss_j * xs + qs_j, Hdd_j @ xd + qd_j])

        def eval_cons(self, z):
            return cons(z)

        def jac_sparse_structure(self):
            return jr, jc

        def eval_jac_blocks(self, z):
            return jv_j, Jd_j

        def eval_hess_blocks(self, z, obj_factor, lam):
            return obj_factor * hss_j, obj_factor * Hdd_j

    flat = AutoDiffNlpProblem(f=f, c=cons, xl=xl, xu=xu, cl=cl, cu=cu, x0=x0)
    return _RandMds(), flat


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_mds_qp_matches_dense_path(seed):
    """The MDS KKT reduction (diag elimination + two Cholesky) agrees with
    the generic dense Newton path on random MDS QPs."""
    from hiop_tpu import NlpMDS

    mds_p, flat_p = _random_mds_qp(seed)
    o1 = NlpOptions()
    o1.update(Hessian="analytical_exact", verbosity_level=0, jit_mode="none")
    r_mds = FilterIPMNewton(NlpMDS(mds_p, o1)).run()
    o2 = NlpOptions()
    o2.update(Hessian="analytical_exact", verbosity_level=0)
    r_flat = FilterIPMNewton(NlpDenseConstraints(flat_p, o2)).run()
    assert r_mds.status.is_success and r_flat.status.is_success
    assert abs(r_mds.obj - r_flat.obj) < 1e-6 * max(1.0, abs(r_flat.obj))
    assert np.allclose(np.asarray(r_mds.x), np.asarray(r_flat.x), atol=1e-5)


def _random_sparse_qp(seed, n=14, m_eq=2, m_ineq=5, diag_hess=False):
    """Random sparse convex QP posed as a SparseProblem (triplet structure)
    plus its dense AutoDiffNlpProblem twin. Hessian is diagonally dominant
    (PD); a random interior point makes the constraint set feasible."""
    from hiop_tpu import SparseProblem

    rng = np.random.default_rng(seed)
    m = m_eq + m_ineq
    # upper-triangle Hessian triplets: full diagonal + sprinkled off-diag
    diag = rng.uniform(1.0, 3.0, n)
    n_off = 0 if diag_hess else 2 * n
    oi = rng.integers(0, n - 1, n_off)
    oj = (oi + 1 + rng.integers(0, np.maximum(n - oi - 1, 1))).clip(max=n - 1)
    ov = rng.uniform(-0.25, 0.25, n_off)
    hr = np.concatenate([np.arange(n), oi])
    hc = np.concatenate([np.arange(n), oj])
    hv = np.concatenate([diag, ov])
    Hd = np.zeros((n, n))
    Hd[hr, hc] += hv
    Hd[hc, hr] += hv
    Hd[np.arange(n), np.arange(n)] /= 2.0
    Hd = (Hd + Hd.T) / 2.0
    q = rng.standard_normal(n)
    # sparse Jacobian: 3 nnz per row
    jr = np.repeat(np.arange(m), 3)
    jc = np.concatenate([rng.choice(n, 3, replace=False) for _ in range(m)])
    jv = rng.standard_normal(3 * m)
    Ad = np.zeros((m, n))
    np.add.at(Ad, (jr, jc), jv)
    x_feas = rng.uniform(-0.5, 0.5, n)
    ax = Ad @ x_feas
    cl = np.where(np.arange(m) < m_eq, ax, ax - rng.uniform(0.2, 1.0, m))
    cu = np.where(np.arange(m) < m_eq, ax, ax + rng.uniform(0.2, 1.0, m))
    xl = x_feas - rng.uniform(0.5, 2.0, n)
    xu = x_feas + rng.uniform(0.5, 2.0, n)
    Hj, qj, Aj = jnp.asarray(Hd), jnp.asarray(q), jnp.asarray(Ad)

    class _RandSparse(SparseProblem):
        jittable = True
        jac_constant = True

        def get_prob_sizes(self):
            return n, m

        def get_vars_info(self):
            return xl, xu

        def get_cons_info(self):
            return cl, cu

        def get_starting_point(self):
            return np.clip(np.zeros(n), xl, xu)

        def get_sparse_blocks_info(self):
            return n, jr.size, hr.size

        def jac_structure(self):
            return jr, jc

        def eval_jac_vals(self, x):
            return jnp.asarray(jv)

        def hess_structure(self):
            return hr, hc

        def eval_hess_vals(self, x, obj_factor, lam):
            return obj_factor * jnp.asarray(hv)

        def eval_f(self, x):
            return 0.5 * x @ (Hj @ x) + qj @ x

        def eval_grad_f(self, x):
            return Hj @ x + qj

        def eval_cons(self, x):
            return Aj @ x

    twin = AutoDiffNlpProblem(
        f=lambda x: 0.5 * x @ (Hj @ x) + qj @ x,
        c=lambda x: Aj @ x,
        xl=xl, xu=xu, cl=cl, cu=cu,
        x0=np.clip(np.zeros(n), xl, xu),
    )
    return _RandSparse(), twin


@pytest.mark.parametrize("seed", [30, 31, 32])
def test_random_sparse_qp_across_kkt_variants(seed):
    """Random sparse QPs: every sparse KKT realization (dense-assembled
    XDYcYd, host splu, native LDL^T, unreduced full-space) agrees with the
    dense autodiff Newton path (reference tier-3 equivalence strategy)."""
    from hiop_tpu import FilterIPMNewton as Newton
    from hiop_tpu import NlpSparse

    sp, twin = _random_sparse_qp(seed)
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0)
    ref = Newton(NlpDenseConstraints(twin, o)).run()
    assert ref.status.is_success
    variants = [
        {},
        {"linear_solver_sparse": "splu"},
        {"linear_solver_sparse": "native_ldl"},
        {"linear_solver_sparse": "device_ldl"},
        {"linear_solver_sparse": "device_ldl", "kkt_fact_dtype": "float32"},
        {"KKTLinsys": "full"},
    ]
    for extra in variants:
        sp_i, _ = _random_sparse_qp(seed)
        oi = NlpOptions()
        oi.update(Hessian="analytical_exact", verbosity_level=0, **extra)
        r = Newton(NlpSparse(sp_i, oi)).run()
        assert r.status.is_success, extra
        assert abs(r.obj - ref.obj) < 1e-6 * (1 + abs(ref.obj)), extra


@pytest.mark.parametrize("seed", [40, 41])
def test_random_sparse_ineq_qp_condensed_and_normaleqn(seed):
    """Inequality-only diagonal-Hessian QPs: the condensed SPD and
    normal-equations KKT classes agree with the dense path."""
    from hiop_tpu import FilterIPMNewton as Newton
    from hiop_tpu import NlpSparse

    _, twin = _random_sparse_qp(seed, m_eq=0, diag_hess=True)
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0)
    ref = Newton(NlpDenseConstraints(twin, o)).run()
    assert ref.status.is_success
    for extra in (
        {"KKTLinsys": "condensed"},
        {"KKTLinsys": "normaleqn"},
        # device CSR two-phase condensed (forced below the size threshold)
        {"KKTLinsys": "condensed", "linear_solver_sparse": "device_ldl"},
        {"KKTLinsys": "condensed", "linear_solver_sparse": "device_ldl",
         "kkt_fact_dtype": "float32"},
    ):
        sp_i, _ = _random_sparse_qp(seed, m_eq=0, diag_hess=True)
        oi = NlpOptions()
        oi.update(Hessian="analytical_exact", verbosity_level=0, **extra)
        r = Newton(NlpSparse(sp_i, oi)).run()
        assert r.status.is_success, extra
        assert abs(r.obj - ref.obj) < 1e-5 * (1 + abs(ref.obj)), extra


@pytest.mark.parametrize("seed", [50, 51, 52])
def test_splu_inertia_matches_eig_across_reg_ladder(seed):
    """The splu backend's diag(U) pivot-sign inertia equals the eigenvalue
    count of the assembled XDYcYd augmented system across the
    regularization ladder (zero deltas, delta_c only, delta_w only, both),
    on random sparse KKT structures with indefinite Hessians."""
    import numpy as np
    import scipy.sparse as sp
    from hiop_tpu.linalg.solver_registry import _splu_factory

    rng = np.random.default_rng(seed)
    n, me, mi = 60, 12, 18
    A = sp.random(n, n, density=0.08, random_state=seed)
    H = (A + A.T) + sp.diags(rng.uniform(-1.0, 2.0, n))   # indefinite
    Jc = sp.random(me, n, density=0.2, random_state=seed + 1) + sp.eye(me, n)
    Jd = sp.random(mi, n, density=0.2, random_state=seed + 2) + sp.eye(mi, n, k=5)
    Dx = rng.uniform(0.1, 1.0, n)
    Dd = rng.uniform(0.1, 1.0, mi)
    for dwx, dcc in [(0.0, 1e-8), (0.0, 1e-2), (1.0, 1e-8), (10.0, 0.5)]:
        K = sp.bmat([
            [H + sp.diags(Dx + dwx), None, Jc.T, Jd.T],
            [None, sp.diags(Dd + dwx), None, -sp.eye(mi)],
            [Jc, None, -dcc * sp.eye(me), None],
            [Jd, -sp.eye(mi), None, -dcc * sp.eye(mi)],
        ], format="csc")
        K = (K + K.T) * 0.5
        s = _splu_factory(K.tocsc(), "amd")
        inert = s.inertia()
        assert inert is not None, (dwx, dcc)
        w = np.linalg.eigvalsh(K.toarray())
        true = (int(np.sum(w > 0)), int(np.sum(w < 0)), int(np.sum(w == 0)))
        assert inert == true, (dwx, dcc, inert, true)
        # and the factorization actually solves
        b = rng.standard_normal(K.shape[0])
        x = s.solve(b)
        assert np.linalg.norm(K @ x - b) < 1e-7 * (1 + np.linalg.norm(b))


def _assembled_kkt_inertia(nlp_cls, problem, opts, deltas, lam_scale=0.0, seed=0):
    """Assemble the real XDYcYd augmented system of a formulation at its
    starting point through SparseXDYcYdKKT and return (kkt, splu_inertia,
    shape info)."""
    import numpy as np
    from hiop_tpu.kkt.sparse_direct import SparseXDYcYdKKT
    from hiop_tpu.optimization import residual as res_mod

    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0, **opts)
    nlp = nlp_cls(problem, o)
    nlp.finalize_initialization()
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(nlp.get_starting_point())
    yc = jnp.asarray(lam_scale * rng.standard_normal(nlp.m_eq))
    yd = jnp.asarray(lam_scale * rng.standard_normal(nlp.m_ineq))
    h_vals = np.asarray(nlp.eval_hess_vals(x0, 1.0, yc, yd))
    Jc, Jd = nlp.eval_jac(x0)
    if hasattr(Jc, "vals"):
        je, ji = np.asarray(Jc.vals), np.asarray(Jd.vals)
    else:
        je = np.asarray(Jc)[nlp.jac_eq_rows, nlp.jac_eq_cols]
        ji = np.asarray(Jd)[nlp.jac_in_rows, nlp.jac_in_cols]
    Dx = rng.uniform(0.05, 2.0, nlp.n)
    Dd = rng.uniform(0.05, 2.0, nlp.m_ineq)
    kkt = SparseXDYcYdKKT(nlp, "splu")
    assert kkt.factorize(h_vals, Dx, Dd, je, ji, deltas)
    return nlp, kkt, (h_vals, Dx, Dd, je, ji)


@pytest.mark.parametrize("n", [5000])
def test_splu_nopivot_inertia_holds_on_ex1_kkt_at_scale(n):
    """VERDICT r3 #7: on the REAL sparse Ex1 augmented system at n=5e3 the
    splu no-pivot symmetric mode must hold (perm_r == perm_c => inertia
    reported, not the pivoted inertia-less fallback), and the reported
    inertia must be the quasi-definite (n + m_i, m_e + m_i, 0)."""
    import examples.sparse_ex1 as sx1
    from hiop_tpu import NlpSparse

    nlp, kkt, _ = _assembled_kkt_inertia(
        NlpSparse, sx1.SparseEx1(n), {}, (0.0, 0.0, 1e-8, 1e-8)
    )
    inert = kkt.last_inertia
    assert inert is not None, "splu fell back to pivoted (inertia-less) mode"
    npos, nneg, nzero = inert
    assert nzero == 0
    # convex Ex1 + positive barrier diagonals: exact quasi-definite inertia
    assert nneg == nlp.m_eq + nlp.m_ineq
    assert npos == nlp.n + nlp.m_ineq


def test_splu_nopivot_inertia_holds_on_acopf_kkt():
    """Same assertion on the ACOPF sparse-twin augmented system (B=128,
    nonconvex Hessian at a random multiplier point), cross-checked against
    the independent native LDL^T pivot-sign inertia."""
    from examples.acopf_mds import AcopfSparse
    from hiop_tpu import NlpSparse
    from hiop_tpu.kkt.sparse_direct import SparseXDYcYdKKT

    nlp, kkt, state = _assembled_kkt_inertia(
        NlpSparse, AcopfSparse(128), {"fixed_var": "relax"},
        (1e-4, 1e-4, 1e-8, 1e-8), lam_scale=0.3, seed=5,
    )
    inert = kkt.last_inertia
    assert inert is not None, "splu fell back to pivoted (inertia-less) mode"
    kkt_ldl = SparseXDYcYdKKT(nlp, "native_ldl")
    assert kkt_ldl.factorize(*state, (1e-4, 1e-4, 1e-8, 1e-8))
    assert kkt_ldl.last_inertia is not None
    assert inert == kkt_ldl.last_inertia


@pytest.mark.slow
def test_splu_nopivot_inertia_holds_on_ex1_kkt_100k():
    """The n=1e5 anchor of the same property (slow tier)."""
    import examples.sparse_ex1 as sx1
    from hiop_tpu import NlpSparse

    nlp, kkt, _ = _assembled_kkt_inertia(
        NlpSparse, sx1.SparseEx1(100_000), {}, (0.0, 0.0, 1e-8, 1e-8)
    )
    inert = kkt.last_inertia
    assert inert is not None
    assert inert == (nlp.n + nlp.m_ineq, nlp.m_eq + nlp.m_ineq, 0)


def test_splu_pivoted_fallback_reports_no_inertia_and_still_solves():
    """The demotion route: a matrix that breaks the no-pivot elimination
    must engage the pivoted fallback — inertia() returns None (callers then
    use the curvature acceptor; runstats n_fact_no_inertia counts it) —
    while solves stay correct."""
    import numpy as np
    import scipy.sparse as sp
    from hiop_tpu.linalg.solver_registry import _splu_factory

    # antidiagonal permutation block: every leading pivot is structurally
    # zero, so unpivoted elimination cannot proceed
    n = 8
    K = sp.csc_matrix(np.fliplr(np.eye(n)))
    s = _splu_factory(K, "none")
    assert s.inertia() is None
    b = np.arange(1.0, n + 1)
    x = s.solve(b)
    assert np.linalg.norm(K @ x - b) < 1e-12
