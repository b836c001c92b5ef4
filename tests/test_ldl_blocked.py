"""Blocked no-pivot LDL^T (linalg/ldl_blocked.py) and the on-device dense
safe tier (kkt/newton_dense.py::factorize_safe_device) — the MAGMA-Nopiv
analogue (reference hiopLinSolverSymDenseMagma.hpp:145)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu.linalg.ldl_blocked import ldl_factor, ldl_solve
from hiop_tpu.kkt import newton_dense as kkt_nd


def _sym(rng, n):
    A = rng.standard_normal((n, n))
    return A + A.T


@pytest.mark.parametrize("n", [5, 37, 128, 130, 300])
def test_ldl_factor_solve_and_inertia(n):
    rng = np.random.default_rng(n)
    M = _sym(rng, n)
    f = ldl_factor(jnp.asarray(M))
    assert bool(f.ok)
    w = np.linalg.eigvalsh(M)
    assert int(f.n_neg) == int(np.sum(w < 0))
    b = rng.standard_normal(n)
    x = np.asarray(ldl_solve(f, jnp.asarray(b)))
    assert np.linalg.norm(M @ x - b) <= 1e-8 * np.linalg.norm(b)


def test_ldl_multiple_rhs():
    rng = np.random.default_rng(7)
    M = _sym(rng, 40)
    f = ldl_factor(jnp.asarray(M))
    B = rng.standard_normal((40, 3))
    X = np.asarray(ldl_solve(f, jnp.asarray(B)))
    assert np.linalg.norm(M @ X - B) <= 1e-8 * np.linalg.norm(B)


def test_ldl_reconstruction():
    rng = np.random.default_rng(3)
    n = 160
    M = _sym(rng, n)
    f = ldl_factor(jnp.asarray(M))
    L = np.asarray(f.L)[:n, :n]
    d = np.asarray(f.d)[:n]
    assert np.allclose(L @ np.diag(d) @ L.T, M, atol=1e-7 * np.abs(M).max())
    # unit diagonal
    assert np.allclose(np.diag(L), 1.0)


def test_ldl_breakdown_detected():
    # exactly singular matrix -> breakdown flagged, not garbage
    M = jnp.zeros((8, 8), jnp.float64)
    f = ldl_factor(M)
    assert not bool(f.ok)


def test_safe_device_matches_host_lu():
    rng = np.random.default_rng(11)
    n, mc, md = 30, 4, 3
    G = rng.standard_normal((n, n))
    H = G @ G.T + np.eye(n)  # PD Hessian block
    Dx = np.abs(rng.standard_normal(n))
    Dd = np.abs(rng.standard_normal(md)) + 0.1
    Jc = rng.standard_normal((mc, n))
    Jd = rng.standard_normal((md, n))
    args = (jnp.asarray(H), jnp.asarray(Dx), jnp.asarray(Dd),
            jnp.asarray(Jc), jnp.asarray(Jd), 0.0, 0.0, 0.0, 0.0)
    fd = kkt_nd.factorize_safe_device(*args)
    fh = kkt_nd.factorize_safe(*args)
    assert bool(fd.ok)
    # same inertia as the eigen count of the host path
    assert int(fd.n_neg_eig) == int(fh.n_neg_eig) == mc + md
    rx = jnp.asarray(rng.standard_normal(n))
    rd = jnp.asarray(rng.standard_normal(md))
    ryc = jnp.asarray(rng.standard_normal(mc))
    ryd = jnp.asarray(rng.standard_normal(md))
    outd = kkt_nd.solve_safe_device(fd, rx, rd, ryc, ryd)
    outh = kkt_nd.solve_safe(fh, rx, rd, ryc, ryd)
    for a, b in zip(outd, outh):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_newton_solve_on_device_ldl_tier():
    """Full Newton solve with the safe tier pinned to the on-device LDL^T
    from the first iteration — same answer as the default quick path."""
    from hiop_tpu import AutoDiffNlpProblem, FilterIPMNewton, NlpOptions
    from hiop_tpu.formulation.dense import NlpDenseConstraints

    class _ForcedSafeNewton(FilterIPMNewton):
        def _make_strategy(self):
            s = super()._make_strategy()
            s._safe_mode = 1
            return s

    n = 12
    p = AutoDiffNlpProblem(
        f=lambda x: 0.25 * jnp.sum((x - 1.0) ** 4) + 0.5 * jnp.sum(x**2),
        c=lambda x: jnp.stack([jnp.sum(x), x[0] * x[1]]),
        xl=-2.0 * np.ones(n),
        xu=2.0 * np.ones(n),
        cl=np.array([1.0, -1e20]),
        cu=np.array([1.0, 1.0]),
        x0=np.zeros(n),
    )

    def run(force_safe):
        o = NlpOptions()
        o.update(
            verbosity_level=0, Hessian="analytical_exact",
            linear_solver_dense="ldl_nopiv", jit_mode="none",
        )
        nlp = NlpDenseConstraints(p, o)
        cls = _ForcedSafeNewton if force_safe else FilterIPMNewton
        return cls(nlp).run()

    r_safe = run(True)
    r_ref = run(False)
    assert r_safe.status.is_success and r_ref.status.is_success
    assert abs((r_safe.obj - r_ref.obj) / (1 + abs(r_ref.obj))) <= 1e-7


@pytest.mark.parametrize("tier", ["ldl_nopiv", "lu_eig"])
def test_mds_safe_tier_matches_quick(tier):
    """MDS safe factorization (partially reduced saddle system) gives the
    same direction as the quick all-Cholesky reduction when both apply."""
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(5)
    ns, nd, mc, md = 50, 12, 4, 3
    hss = np.abs(rng.standard_normal(ns)) + 0.5
    G = rng.standard_normal((nd, nd))
    Hdd = G @ G.T + np.eye(nd)
    Dxs = np.abs(rng.standard_normal(ns))
    Dxd = np.abs(rng.standard_normal(nd))
    Dd = np.abs(rng.standard_normal(md)) + 0.1
    Jc_s = rng.standard_normal((mc, ns))
    Jc_d = rng.standard_normal((mc, nd))
    Jd_s = rng.standard_normal((md, ns))
    Jd_d = rng.standard_normal((md, nd))
    args = tuple(
        jnp.asarray(a)
        for a in (hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d)
    ) + (0.0, 0.0, 0.0, 0.0)
    fq = kkt_mds.factorize(*args)
    fs = kkt_mds.factorize_safe(*args, host=(tier == "lu_eig"))
    assert bool(fq.ok) and bool(fs.ok)
    assert int(fs.n_neg_eig) == mc + md
    rxs = jnp.asarray(rng.standard_normal(ns))
    rxd = jnp.asarray(rng.standard_normal(nd))
    rd = jnp.asarray(rng.standard_normal(md))
    ryc = jnp.asarray(rng.standard_normal(mc))
    ryd = jnp.asarray(rng.standard_normal(md))
    outq = kkt_mds.solve(fq, rxs, rxd, rd, ryc, ryd)
    outs = kkt_mds.solve_safe(fs, rxs, rxd, rd, ryc, ryd)
    for a, b in zip(outq, outs):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_mds_solve_forced_safe_mode():
    """Full MDS Ex1 solve with the strategy pinned to the safe tier from
    iteration 0 reproduces the reference objective."""
    import examples.mds_ex1 as mx1
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions

    class _ForcedSafeNewton(FilterIPMNewton):
        def _make_strategy(self):
            s = super()._make_strategy()
            s._safe_mode = 1
            return s

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", KKTLinsys="xdycyd", verbosity_level=0,
        tolerance=1e-5, mu0=0.1, duals_init="zero",
        duals_update_type="linear", jit_mode="none",
        linear_solver_dense="ldl_nopiv",
    )
    nlp = NlpMDS(mx1.MdsEx1(100, 32), o)
    r = _ForcedSafeNewton(nlp).run()
    assert r.status.is_success
    # cross-check against the quick path at the same size
    r_ref = mx1.solve(100, 32, verbosity_level=0, jit_mode="none")
    assert abs((r.obj - r_ref.obj) / (1 + abs(r_ref.obj))) <= 1e-6
