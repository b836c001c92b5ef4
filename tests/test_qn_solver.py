"""End-to-end tests of the quasi-Newton filter IPM on small NLPs with known
solutions (the reference's '-selfcheck' driver style, SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMQuasiNewton,
    NlpDenseConstraints,
    NlpOptions,
)


def _solve(problem, **opts):
    o = NlpOptions()
    o.update(verbosity_level=0, **opts)
    nlp = NlpDenseConstraints(problem, o)
    solver = FilterIPMQuasiNewton(nlp)
    return solver.run()


def test_unconstrained_quadratic():
    # min 0.5*||x - 1||^2, no constraints, wide bounds
    n = 7
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum((x - 1.0) ** 2),
        c=None,
        xl=-1e20 * np.ones(n),
        xu=1e20 * np.ones(n),
        cl=np.zeros(0),
        cu=np.zeros(0),
        x0=np.zeros(n),
    )
    r = _solve(p)
    assert r.status.is_success
    assert np.allclose(r.x, 1.0, atol=1e-6)
    assert abs(r.obj) < 1e-8


def test_bound_constrained_quadratic():
    # min 0.5*||x||^2 s.t. x >= 0.5 -> x* = 0.5
    n = 5
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum(x**2),
        c=None,
        xl=0.5 * np.ones(n),
        xu=1e20 * np.ones(n),
        cl=np.zeros(0),
        cu=np.zeros(0),
        x0=np.ones(n),
    )
    r = _solve(p)
    assert r.status.is_success
    assert np.allclose(r.x, 0.5, atol=1e-6)


def test_equality_constrained_qp():
    # min 0.5*||x||^2 s.t. sum(x) = 1 -> x* = 1/n
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
    r = _solve(p)
    assert r.status.is_success
    assert np.allclose(r.x, 1.0 / n, atol=1e-6)
    assert abs(r.obj - 0.5 / n) < 1e-6


def test_inequality_qp():
    # min 0.5*||x - 2||^2 s.t. sum(x) <= 1 -> x_i = 1/n + (2 - ... )
    # optimum: x = 2 - lam/..., active constraint: x_i = 1/n each? Solve:
    # symmetric: x_i = t with n*t <= 1, minimize (t-2)^2 -> t = 1/n.
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
    r = _solve(p)
    assert r.status.is_success
    assert np.allclose(r.x, 0.25, atol=1e-6)


def test_two_sided_inequality_and_bounds():
    # min sum (x-1)^4/4 s.t. 1 <= sum x <= 2, 0 <= x <= 0.4  -> hits x=0.4?
    # With n=5: sum x in [1,2]; unconstrained opt x=1 each but ub=0.4 ->
    # x_i=0.4, sum=2.0 feasible at the upper edge.
    n = 5
    p = AutoDiffNlpProblem(
        f=lambda x: 0.25 * jnp.sum((x - 1.0) ** 4),
        c=lambda x: jnp.sum(x)[None],
        xl=np.zeros(n),
        xu=0.4 * np.ones(n),
        cl=np.array([1.0]),
        cu=np.array([2.0]),
        x0=0.2 * np.ones(n),
    )
    r = _solve(p)
    assert r.status.is_success
    assert np.allclose(r.x, 0.4, atol=1e-5)


def test_iterate_callback_stop():
    n = 4
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum(x**2),
        c=None,
        xl=-1e20 * np.ones(n),
        xu=1e20 * np.ones(n),
        cl=np.zeros(0),
        cu=np.zeros(0),
        x0=np.ones(n),
    )
    calls = []

    def cb(info):
        calls.append(info.iter)
        return info.iter < 1

    p.iterate_callback = cb
    r = _solve(p)
    from hiop_tpu import SolveStatus

    assert r.status == SolveStatus.User_Stopped
    assert len(calls) >= 1
