"""Newton-path tests: exact-Hessian IPM, regularization, sparse examples."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    NlpDenseConstraints,
    NlpOptions,
)

import examples.sparse_ex1 as sx1
import examples.sparse_ex2 as sx2


def _solve_newton(problem, **opts):
    o = NlpOptions()
    o.update(Hessian="analytical_exact", **opts)
    nlp = NlpDenseConstraints(problem, o)
    return FilterIPMNewton(nlp).run()


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def test_newton_equality_qp():
    n = 6
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum(x**2),
        c=lambda x: jnp.sum(x)[None],
        xl=-1e20 * np.ones(n),
        xu=1e20 * np.ones(n),
        cl=np.array([1.0]),
        cu=np.array([1.0]),
        x0=np.zeros(n),
    )
    r = _solve_newton(p)
    assert r.status.is_success
    assert np.allclose(r.x, 1.0 / n, atol=1e-7)


def test_newton_rosenbrock_bounded():
    # nonconvex: Rosenbrock with bounds; regularization loop must engage
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    n = 8
    p = AutoDiffNlpProblem(
        f=rosen,
        c=None,
        xl=-2.0 * np.ones(n),
        xu=2.0 * np.ones(n),
        cl=np.zeros(0),
        cu=np.zeros(0),
        x0=-1.2 * np.ones(n),
    )
    r = _solve_newton(p, max_iter=300)
    assert r.status.is_success
    assert np.allclose(r.x, 1.0, atol=1e-5)


def test_newton_inequality_nonconvex():
    n = 5
    p = AutoDiffNlpProblem(
        f=lambda x: jnp.sum(jnp.cos(x) + 0.1 * x**2),
        c=lambda x: jnp.sum(x)[None],
        xl=-5.0 * np.ones(n),
        xu=5.0 * np.ones(n),
        cl=np.array([-1e20]),
        cu=np.array([10.0]),
        x0=np.zeros(n),
    )
    r = _solve_newton(p, max_iter=200)
    assert r.status.is_success


def test_newton_stable_mode():
    n = 4
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum((x - 2.0) ** 2),
        c=lambda x: jnp.sum(x)[None],
        xl=-1e20 * np.ones(n),
        xu=1e20 * np.ones(n),
        cl=np.array([-1e20]),
        cu=np.array([1.0]),
        x0=np.zeros(n),
    )
    r = _solve_newton(p, linsol_mode="stable")
    assert r.status.is_success
    assert np.allclose(r.x, 0.25, atol=1e-6)


def test_sparse_ex1_selfcheck():
    r = sx1.solve(50, verbosity_level=0)
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_sparse_ex1_inertia_free():
    r = sx1.solve(50, verbosity_level=0, fact_acceptor="inertia_free")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_sparse_ex2_rank_deficient():
    r = sx2.solve(50, verbosity_level=0)
    assert r.status.is_success
    ref, tol = sx2.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_sparse_ex2_convex_no_rankdef():
    r = sx2.solve(
        50, verbosity_level=0,
        convex_obj=True, rankdefic_eq=False, rankdefic_ineq=False,
    )
    assert r.status.is_success


def test_newton_duals_update_forced_linear():
    o = NlpOptions()
    o.update(Hessian="analytical_exact")
    assert o.str_("duals_update_type") == "linear"


def test_sparse_ex4_concave_selfcheck():
    """Tiny concave QP (NlpSparseEx4): negative objective curvature at every
    iterate exercises the delta_w regularization ladder end to end; converges
    to the verified global optimum (the reference driver's own table is
    copy-pasted from Ex1 — see examples/sparse_ex4.py docstring)."""
    import examples.sparse_ex4 as sx4

    r = sx4.solve()
    assert r.status.is_success
    ref, tol = sx4.SELFCHECK[2]
    assert abs((r.obj - ref) / (1 + abs(ref))) < tol


def test_step_error_returns_best_effort_iterate(monkeypatch):
    """An unrecoverable step-computation failure must return the LAST
    finite iterate (the reference reports the last iterate on
    Err_Step_Computation), not zeros/NaN."""
    import numpy as np
    import hiop_tpu.optimization.filter_ipm as fi
    from hiop_tpu import (
        AutoDiffNlpProblem, FilterIPMNewton, NlpDenseConstraints, NlpOptions,
    )
    import jax.numpy as jnp

    calls = {"n": 0}
    orig = fi._NewtonDenseStrategy.compute_direction

    def failing(self, resid, it, b):
        calls["n"] += 1
        if calls["n"] > 3:
            raise fi._StepComputationError("synthetic failure")
        return orig(self, resid, it, b)

    monkeypatch.setattr(fi._NewtonDenseStrategy, "compute_direction", failing)
    p = AutoDiffNlpProblem(
        f=lambda x: jnp.sum((x - 1.0) ** 2),
        c=lambda x: jnp.sum(x)[None],
        xl=np.zeros(5), xu=np.full(5, 10.0),
        cl=np.array([2.0]), cu=np.array([2.0]),
        x0=np.full(5, 0.3),
    )
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0, jit_mode="none")
    r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
    assert r.status.name == "Err_Step_Computation"
    assert np.all(np.isfinite(r.x))
    assert np.isfinite(r.obj)
