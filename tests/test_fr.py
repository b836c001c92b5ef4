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
