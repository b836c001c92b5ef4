"""Feasibility-restoration subproblem tests.

The sparse-preserving FR (SparseFeasibilityRestorationProblem, parity
hiopFRProb.hpp:87) must (a) pose the exact same FR NLP as the generic
dense-assembled one, and (b) keep the Jacobian/Hessian in triplet form so
restoration scales to large sparse problems with no dense (m, n+2m)
materialization — the round-1 'done' bar (an n~2e5 FR subproblem step).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import examples.sparse_ex1 as sx1
from hiop_tpu import FilterIPMNewton, NlpOptions, NlpSparse
from hiop_tpu.optimization.fr_problem import (
    FeasibilityRestorationProblem,
    SparseFeasibilityRestorationProblem,
)


def _base_form(n, **opts):
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0, **opts)
    nlp = NlpSparse(sx1.SparseEx1(n), o)
    nlp.finalize_initialization()
    return nlp


def _coo_dense(rows, cols, vals, shape):
    a = np.zeros(shape)
    np.add.at(a, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    return a


def test_sparse_fr_matches_dense_fr_exactly():
    """Triplet FR assembly == dense FR assembly at a live point: same
    objective/gradient/constraints, same Jacobian, same Hessian."""
    base = _base_form(30)
    x_ref = jnp.asarray(base.get_starting_point())
    fd = FeasibilityRestorationProblem(base, x_ref, 0.1, 2.5)
    fs = SparseFeasibilityRestorationProblem(base, x_ref, 0.1, 2.5)
    z = jnp.asarray(fs.get_starting_point()) * 1.01 + 0.003

    assert fs.n == fd.n and fs.m == fd.m
    assert float(fs.eval_f(z)) == pytest.approx(float(fd.eval_f(z)), rel=1e-14)
    np.testing.assert_allclose(
        np.asarray(fs.eval_grad_f(z)), np.asarray(fd.eval_grad_f(z)), rtol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(fs.eval_cons(z)), np.asarray(fd.eval_cons(z)), rtol=1e-14
    )

    jr, jc = fs.jac_structure()
    J_sp = _coo_dense(jr, jc, fs.eval_jac_vals(z), (fs.m, fs.n))
    np.testing.assert_allclose(J_sp, np.asarray(fd.eval_jac_cons(z)), atol=1e-13)

    lam = jnp.asarray(np.linspace(-0.5, 0.7, fs.m))
    hr, hc = fs.hess_structure()
    U = _coo_dense(hr, hc, fs.eval_hess_vals(z, 0.8, lam), (fs.n, fs.n))
    H_sp = U + U.T - np.diag(np.diag(U))
    np.testing.assert_allclose(
        H_sp, np.asarray(fd.eval_hess_lagr(z, 0.8, lam)), atol=1e-13
    )


def test_forced_resto_routes_through_sparse_fr(monkeypatch):
    """force_resto on a sparse base must instantiate the triplet FR class
    and still converge to the selfcheck objective."""
    import hiop_tpu.optimization.fr_problem as frm

    made = {}
    orig = frm.SparseFeasibilityRestorationProblem

    class Spy(orig):
        def __init__(self, *a, **kw):
            made["sparse_fr"] = True
            super().__init__(*a, **kw)

    monkeypatch.setattr(frm, "SparseFeasibilityRestorationProblem", Spy)
    r = sx1.solve(50, verbosity_level=0, force_resto="yes")
    assert made.get("sparse_fr"), "FR did not route through the sparse class"
    assert r.status.is_success
    ref, _ = sx1.SELFCHECK[50]
    assert abs(r.obj - ref) <= 1e-5 * max(1.0, abs(ref))


@pytest.mark.slow
def test_sparse_fr_scales_no_dense_materialization():
    """n=200,000 FR subproblem: the FR formulation must stay matrix-free
    (TripletMatrix Jacobian handles) and complete IPM iterations.  The
    dense-assembled FR Jacobian here would be (m, n+2m) ~ 2e5 x 1e6 f64
    = 1.6 TB, so completing AT ALL is the no-densification proof; the
    explicit TripletMatrix assertion pins the mechanism."""
    import time

    from hiop_tpu.linalg.sparse import TripletMatrix

    n = 200_000
    base = _base_form(n)
    x_ref = jnp.asarray(base.get_starting_point())
    fs = SparseFeasibilityRestorationProblem(base, x_ref, 0.1, 1.0)

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact",
        verbosity_level=0,
        scaling_type="none",
        max_iter=2,
        mu0=0.1,
    )
    nlp_fr = NlpSparse(fs, o)
    nlp_fr.finalize_initialization()
    assert nlp_fr.matrix_free, "large FR formulation must stay in triplet form"
    Jc, Jd = nlp_fr.eval_jac(jnp.asarray(nlp_fr.get_starting_point()))
    assert isinstance(Jc, TripletMatrix) and isinstance(Jd, TripletMatrix)

    t0 = time.time()
    r = FilterIPMNewton(nlp_fr).run()
    dt = time.time() - t0
    assert r.iterations >= 1 and np.isfinite(r.obj)
    print(f"FR n={n}: {r.iterations} iters in {dt:.1f}s")


# ---------------------------------------------------------------------------
# MDS FR (MdsFeasibilityRestorationProblem, parity hiopFRProb.hpp:238)

def _mds_base(B, **opts):
    from examples.acopf_mds import AcopfMds
    from hiop_tpu import NlpMDS

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax",
             verbosity_level=0, **opts)
    nlp = NlpMDS(AcopfMds(B), o)
    nlp.finalize_initialization()
    return nlp


def test_mds_fr_matches_dense_fr_exactly():
    """MDS-structured FR == generic dense-assembled FR at a live point,
    up to the [x_s, p, n, x_d] variable permutation."""
    from hiop_tpu.optimization.fr_problem import MdsFeasibilityRestorationProblem

    base = _mds_base(8)
    x_ref = jnp.asarray(base.get_starting_point())
    fd = FeasibilityRestorationProblem(base, x_ref, 0.1, 2.5)
    fm = MdsFeasibilityRestorationProblem(base, x_ref, 0.1, 2.5)
    ns, nd, m, n_x = base.n_sparse, base.n_dense, base.m_eq + base.m_ineq, base.n
    # z_mds[i] = z_dense[pidx[i]]
    pidx = np.concatenate([
        np.arange(ns), n_x + np.arange(2 * m), ns + np.arange(nd)
    ])
    z_d = jnp.asarray(fd.get_starting_point()) * 1.01 + 0.003
    z_m = z_d[pidx]

    np.testing.assert_allclose(
        np.asarray(fm.get_starting_point()),
        np.asarray(fd.get_starting_point())[pidx], rtol=1e-14,
    )
    lo_m, hi_m = fm.get_vars_info()
    lo_d, hi_d = fd.get_vars_info()
    np.testing.assert_allclose(lo_m, lo_d[pidx])
    np.testing.assert_allclose(hi_m, hi_d[pidx])

    assert float(fm.eval_f(z_m)) == pytest.approx(float(fd.eval_f(z_d)), rel=1e-14)
    np.testing.assert_allclose(
        np.asarray(fm.eval_grad_f(z_m)),
        np.asarray(fd.eval_grad_f(z_d))[pidx], rtol=1e-13, atol=1e-15,
    )
    np.testing.assert_allclose(
        np.asarray(fm.eval_cons(z_m)), np.asarray(fd.eval_cons(z_d)),
        rtol=1e-13, atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(fm.eval_jac_cons(z_m)),
        np.asarray(fd.eval_jac_cons(z_d))[:, pidx], atol=1e-13,
    )
    lam = jnp.asarray(np.linspace(-0.5, 0.7, fm.m))
    np.testing.assert_allclose(
        np.asarray(fm.eval_hess_lagr(z_m, 0.8, lam)),
        np.asarray(fd.eval_hess_lagr(z_d, 0.8, lam))[np.ix_(pidx, pidx)],
        atol=1e-13,
    )


def test_forced_resto_routes_through_mds_fr(monkeypatch):
    """force_resto on an MDS base must instantiate the MDS FR class, keep
    the nested formulation MDS-structured, and still converge."""
    import hiop_tpu.optimization.fr_problem as frm
    from examples.acopf_mds import SELFCHECK

    made = {}
    orig = frm.MdsFeasibilityRestorationProblem

    class Spy(orig):
        def __init__(self, *a, **kw):
            made["mds_fr"] = True
            super().__init__(*a, **kw)

    monkeypatch.setattr(frm, "MdsFeasibilityRestorationProblem", Spy)
    base = _mds_base(32, force_resto="yes", tolerance=1e-6, mu0=0.1)
    r = FilterIPMNewton(base).run()
    assert made.get("mds_fr"), "FR did not route through the MDS class"
    assert r.status.is_success
    ref, tol = SELFCHECK[32]
    assert abs(r.obj - ref) <= tol * max(1.0, abs(ref))


def test_mds_fr_stays_block_structured_at_b512_scale():
    """At the north-star B=512 shape the MDS FR problem must expose only
    triplet sparse values + the (m, n_d) dense block — never the
    (m, n + 2m) dense [J | -I | I] the generic class assembles."""
    from hiop_tpu.optimization.fr_problem import MdsFeasibilityRestorationProblem

    base = _mds_base(512)
    x_ref = jnp.asarray(base.get_starting_point())
    fm = MdsFeasibilityRestorationProblem(base, x_ref, 0.1, 1.0)
    n_sp, n_de = fm.get_sparse_dense_blocks_info()
    assert n_sp == base.n_sparse + 2 * fm.m
    assert n_de == base.n_dense
    z = jnp.asarray(fm.get_starting_point())
    sp_vals, dense_blk = fm.eval_jac_blocks(z)
    jr, jc = fm.jac_sparse_structure()
    assert sp_vals.shape == jr.shape == jc.shape
    assert dense_blk.shape == (fm.m, base.n_dense)
    # sparse nnz stays O(base nnz + 2m) — no densification
    assert sp_vals.size < 30 * fm.m
    hss, hdd = fm.eval_hess_blocks(z, 1.0, jnp.zeros((fm.m,)))
    assert hss.shape == (n_sp,)
    assert hdd.shape == (n_de, n_de)
