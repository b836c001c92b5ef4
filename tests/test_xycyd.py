"""The distinct XYcYd compressed linearization (hiopKKTLinSys.hpp:292-301).

Round-2 item: ``KKTLinsys=xycyd`` must be a real 3-block realization (d
eliminated through the (Dd+delta_wd)^{-1} block), not an alias of xdycyd.
Tests: (1) algebraic equivalence of the two linearizations' directions on
random data, dense and sparse realizations; (2) end-to-end solves on the
shipped examples match the xdycyd objectives.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import examples.sparse_ex1 as sx1
from hiop_tpu.kkt import newton_dense as kkt_nd


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def _random_kkt(seed=0, n=14, mc=3, md=5):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    H = Q @ Q.T + n * np.eye(n)          # SPD so inertia is (n, mc+md, 0)
    Jc = rng.standard_normal((mc, n))
    Jd = rng.standard_normal((md, n))
    Dx = rng.uniform(0.1, 2.0, n)
    Dd = rng.uniform(0.1, 2.0, md)
    rx = rng.standard_normal(n)
    rd = rng.standard_normal(md)
    ryc = rng.standard_normal(mc)
    ryd = rng.standard_normal(md)
    return H, Jc, Jd, Dx, Dd, rx, rd, ryc, ryd


@pytest.mark.parametrize("deltas", [(0.0, 0.0, 0.0, 0.0), (1e-3, 1e-3, 1e-7, 1e-7)])
def test_dense_xycyd_matches_xdycyd_directions(deltas):
    """Solving the assembled XYcYd system + dd recovery must reproduce the
    XDYcYd solution exactly (they are two reductions of the same KKT)."""
    H, Jc, Jd, Dx, Dd, rx, rd, ryc, ryd = _random_kkt()
    dwx, dwd, dcc, dcd = deltas
    n, mc, md = H.shape[0], Jc.shape[0], Jd.shape[0]

    M4 = np.asarray(
        kkt_nd.assemble_xdycyd(
            jnp.asarray(H), jnp.asarray(Dx), jnp.asarray(Dd),
            jnp.asarray(Jc), jnp.asarray(Jd), dwx, dwd, dcc, dcd,
        )
    )
    sol4 = np.linalg.solve(M4, np.concatenate([rx, rd, ryc, ryd]))
    dx4, dd4 = sol4[:n], sol4[n:n + md]
    dyc4, dyd4 = sol4[n + md:n + md + mc], sol4[n + md + mc:]

    M3 = np.asarray(
        kkt_nd.assemble_xycyd(
            jnp.asarray(H), jnp.asarray(Dx), jnp.asarray(Dd),
            jnp.asarray(Jc), jnp.asarray(Jd), dwx, dwd, dcc, dcd,
        )
    )
    dd_inv = 1.0 / (Dd + dwd)
    ryd_t = ryd + dd_inv * rd
    sol3 = np.linalg.solve(M3, np.concatenate([rx, ryc, ryd_t]))
    dx3, dyc3, dyd3 = sol3[:n], sol3[n:n + mc], sol3[n + mc:]
    dd3 = dd_inv * (rd + dyd3)

    assert np.allclose(dx3, dx4, atol=1e-9)
    assert np.allclose(dd3, dd4, atol=1e-9)
    assert np.allclose(dyc3, dyc4, atol=1e-9)
    assert np.allclose(dyd3, dyd4, atol=1e-9)


def test_dense_xycyd_safe_factors_inertia_and_solve():
    """factorize_xycyd_safe reports inertia (n, mc+md, 0) for an SPD
    Hessian block and its solve matches a direct dense solve."""
    H, Jc, Jd, Dx, Dd, rx, rd, ryc, ryd = _random_kkt(seed=3)
    n, mc, md = H.shape[0], Jc.shape[0], Jd.shape[0]
    f = kkt_nd.factorize_xycyd_safe(
        jnp.asarray(H), jnp.asarray(Dx), jnp.asarray(Dd),
        jnp.asarray(Jc), jnp.asarray(Jd), 0.0, 0.0, 0.0, 0.0,
    )
    assert bool(f.ok)
    assert int(f.n_neg_eig) == mc + md
    dd_inv = 1.0 / Dd
    ryd_t = ryd + dd_inv * rd
    dx, dyc, dyd = kkt_nd.solve_xycyd_safe(
        f, jnp.asarray(rx), jnp.asarray(ryc), jnp.asarray(ryd_t)
    )
    M3 = np.asarray(
        kkt_nd.assemble_xycyd(
            jnp.asarray(H), jnp.asarray(Dx), jnp.asarray(Dd),
            jnp.asarray(Jc), jnp.asarray(Jd), 0.0, 0.0, 0.0, 0.0,
        )
    )
    ref = np.linalg.solve(M3, np.concatenate([rx, ryc, ryd_t]))
    got = np.concatenate([np.asarray(dx), np.asarray(dyc), np.asarray(dyd)])
    assert np.allclose(got, ref, atol=1e-9)


def test_sparse_xycyd_matches_xdycyd_solve():
    """The triplet SparseXYcYdKKT must produce the same (dx, dd, dyc, dyd)
    as SparseXDYcYdKKT from the same problem data."""
    from hiop_tpu.formulation.sparse import NlpSparse
    from hiop_tpu.kkt.sparse_direct import SparseXDYcYdKKT, SparseXYcYdKKT
    from hiop_tpu import NlpOptions

    o = NlpOptions()
    o.update(Hessian="analytical_exact")
    nlp = NlpSparse(sx1.SparseEx1(30), o)
    nlp.finalize_initialization()
    rng = np.random.default_rng(7)
    nnz_h = len(np.asarray(nlp.hess_rows))
    hvals = rng.standard_normal(nnz_h)
    # make the assembled H diagonally dominant so both systems are regular
    diag = np.asarray(nlp.hess_rows) == np.asarray(nlp.hess_cols)
    hvals[diag] = np.abs(hvals[diag]) + 10.0
    Dx = rng.uniform(0.5, 1.5, nlp.n)
    Dd = rng.uniform(0.5, 1.5, nlp.m_ineq)
    je = rng.standard_normal(len(np.asarray(nlp.jac_eq_rows)))
    ji = rng.standard_normal(len(np.asarray(nlp.jac_in_rows)))
    deltas = (0.0, 0.0, 0.0, 0.0)
    rx = rng.standard_normal(nlp.n)
    rd = rng.standard_normal(nlp.m_ineq)
    ryc = rng.standard_normal(nlp.m_eq)
    ryd = rng.standard_normal(nlp.m_ineq)

    k4 = SparseXDYcYdKKT(nlp, "splu")
    assert k4.factorize(hvals, Dx, Dd, je, ji, deltas)
    out4 = k4.solve(rx, rd, ryc, ryd)
    k3 = SparseXYcYdKKT(nlp, "splu")
    assert k3.factorize(hvals, Dx, Dd, je, ji, deltas)
    out3 = k3.solve(rx, rd, ryc, ryd)
    for a, b in zip(out3, out4):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_sparse_ex1_xycyd_end_to_end_splu():
    r = sx1.solve(
        50, verbosity_level=0, KKTLinsys="xycyd", linear_solver_sparse="splu"
    )
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_sparse_ex1_xycyd_end_to_end_native_ldl():
    """native_ldl reports pivot-sign inertia of the 3-block matrix; the
    inertia-correction acceptor must accept (nneg == m_eq + m_ineq)."""
    from hiop_tpu.native import ldl as native_ldl

    if not native_ldl.native_available():
        pytest.skip("no C++ toolchain")
    r = sx1.solve(
        50, verbosity_level=0, KKTLinsys="xycyd",
        linear_solver_sparse="native_ldl",
    )
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_dense_example_xycyd_quick_tier():
    """Dense NLP with KKTLinsys=xycyd: the quick Schur tier is shared with
    xdycyd (same reduction); the solve must hit the selfcheck objective."""
    import examples.dense_ex2 as dx2

    r = dx2.solve(50, verbosity_level=0, Hessian="analytical_exact",
                  KKTLinsys="xycyd")
    assert r.status.is_success
