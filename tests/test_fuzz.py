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
