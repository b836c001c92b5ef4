"""Backend-parameterized semantic tests for the pattern vector kernels.

The reference runs one abstract test suite per LA abstraction against every
backend implementation (tests/LinAlg/vectorTests.hpp subclassed as
vectorTestsPar / vectorTestsCuda / vectorTestsRajaPar ... — SURVEY.md §4
tier 1).  Here the same mechanism: each kernel's semantics is written once
in plain numpy, and the jax implementation is checked against it under
three execution backends — eager (op-by-op), jit (one compiled program),
and sharded (inputs distributed over the 8-device mesh, reductions
lowering to collectives, replacing the reference's real-2-rank MPI runs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hiop_tpu.linalg import vector_ops as vo
from hiop_tpu.parallel.mesh import make_mesh

N = 64
BACKENDS = ["eager", "jit", "sharded"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    if request.param == "sharded" and len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return request.param


def run(backend, fn, *args):
    if backend == "eager":
        out = fn(*[jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args])
    else:
        if backend == "sharded":
            sh = NamedSharding(make_mesh(8), P("n"))
            args = [
                jax.device_put(jnp.asarray(a), sh)
                if isinstance(a, np.ndarray) and a.ndim == 1 and a.size % 8 == 0
                else a
                for a in args
            ]
        out = jax.jit(fn)(*args)
    return jax.tree.map(np.asarray, out)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.1, 2.0, N)
    pat = (rng.random(N) < 0.7).astype(np.float64)
    return rng, s, pat


def test_logbar_sum(backend):
    _, s, pat = _data()
    got = run(backend, vo.logbar_sum, s, pat)
    want = np.sum(np.log(s[pat == 1.0]))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_add_logbar_grad(backend):
    rng, s, pat = _data(1)
    grad = rng.normal(size=N)
    got = run(backend, vo.add_logbar_grad, grad, 0.37, s, pat)
    want = grad + np.where(pat == 1.0, 0.37 / s, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_linear_damping_term(backend):
    rng, s, pl = _data(2)
    pr = (rng.random(N) < 0.4).astype(np.float64)
    got = run(backend, vo.linear_damping_term, s, pl, pr, 0.01, 1e-5)
    want = 1e-5 * 0.01 * np.sum(s[(pl == 1.0) & (pr == 0.0)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_add_linear_damping_grad(backend):
    rng, _, pl = _data(3)
    pr = (rng.random(N) < 0.4).astype(np.float64)
    grad = rng.normal(size=N)
    got = run(backend, vo.add_linear_damping_grad, grad, pl, pr, 0.25)
    np.testing.assert_allclose(got, grad + (pl - pr) * 0.25, rtol=1e-12)


def test_fraction_to_the_boundary(backend):
    rng, s, pat = _data(4)
    ds = rng.normal(size=N)
    tau = 0.99
    got = run(backend, vo.fraction_to_the_boundary, s, ds, tau, pat)
    neg = (ds < 0) & (pat == 1.0)
    want = min(1.0, np.min(-tau * s[neg] / ds[neg])) if neg.any() else 1.0
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_fraction_to_the_boundary_no_pattern(backend):
    rng, s, _ = _data(5)
    ds = rng.normal(size=N)
    got = run(backend, vo.fraction_to_the_boundary, s, ds, 0.9)
    neg = ds < 0
    want = min(1.0, np.min(-0.9 * s[neg] / ds[neg])) if neg.any() else 1.0
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_adjust_duals_plh(backend):
    rng, s, pat = _data(6)
    z = rng.uniform(0.0, 5.0, N)
    mu, ks = 1e-2, 1e10
    got = run(backend, vo.adjust_duals_plh, z, s, pat, mu, ks)
    lo, hi = mu / (ks * s), ks * mu / s
    want = np.where(pat == 1.0, np.clip(z, lo, hi), 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_project_into_bounds(backend):
    rng = np.random.default_rng(7)
    xl = rng.uniform(-2.0, 0.0, N)
    xu = xl + rng.uniform(0.5, 3.0, N)
    ixl = (rng.random(N) < 0.6).astype(np.float64)
    ixu = (rng.random(N) < 0.6).astype(np.float64)
    x = rng.uniform(-4.0, 4.0, N)
    k1, k2 = 1e-2, 1e-2
    got = run(backend, vo.project_into_bounds, x, xl, ixl, xu, ixu, k1, k2)

    want = x.copy()
    for i in range(N):
        if ixl[i] == 1.0 and ixu[i] == 1.0:
            pl = min(k1 * max(1.0, abs(xl[i])), k2 * (xu[i] - xl[i]))
            pu = min(k1 * max(1.0, abs(xu[i])), k2 * (xu[i] - xl[i]))
            want[i] = np.clip(x[i], xl[i] + pl, xu[i] - pu)
        elif ixl[i] == 1.0:
            want[i] = max(x[i], xl[i] + k1 * max(1.0, abs(xl[i])))
        elif ixu[i] == 1.0:
            want[i] = min(x[i], xu[i] - k1 * max(1.0, abs(xu[i])))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_slacks(backend):
    rng = np.random.default_rng(8)
    x = rng.normal(size=N)
    xl = x - rng.uniform(0.1, 1.0, N)
    xu = x + rng.uniform(0.1, 1.0, N)
    ixl = (rng.random(N) < 0.5).astype(np.float64)
    ixu = (rng.random(N) < 0.5).astype(np.float64)
    np.testing.assert_allclose(
        run(backend, vo.slack_lower, x, xl, ixl),
        np.where(ixl == 1.0, x - xl, 1.0),
    )
    np.testing.assert_allclose(
        run(backend, vo.slack_upper, x, xu, ixu),
        np.where(ixu == 1.0, xu - x, 1.0),
    )


def test_adjust_small_slacks(backend):
    rng, _, pat = _data(9)
    mu = 1e-8
    eps = np.finfo(np.float64).eps
    slack = rng.uniform(0.1, 1.0, N)
    # plant tiny slacks at selected positions
    tiny_idx = np.where(pat == 1.0)[0][:5]
    slack[tiny_idx] = eps * mu * 0.1
    bound = rng.normal(size=N) * 3
    dual = rng.uniform(0.5, 2.0, N)
    new_slack, n_adj = run(backend, vo.adjust_small_slacks, slack, bound, dual, pat, mu)
    assert int(n_adj) == len(tiny_idx)
    small_val = eps * min(1.0, mu)
    for i in tiny_idx:
        cand = max(mu / dual[i], small_val)
        cap = max(slack[i], 0.0) + eps**0.75 * max(1.0, abs(bound[i]))
        np.testing.assert_allclose(new_slack[i], min(cand, cap), rtol=1e-12)
    untouched = np.setdiff1d(np.arange(N), tiny_idx)
    np.testing.assert_allclose(new_slack[untouched], slack[untouched])


def test_norms(backend):
    rng, _, pat = _data(10)
    v = rng.normal(size=N)
    np.testing.assert_allclose(run(backend, vo.infnorm, v), np.max(np.abs(v)))
    np.testing.assert_allclose(run(backend, vo.onenorm, v), np.sum(np.abs(v)), rtol=1e-14)
    np.testing.assert_allclose(
        run(backend, vo.infnorm_w_pattern, v, pat),
        np.max(np.abs(v) * (pat == 1.0)),
    )
