"""Backend-parameterized semantic tests for the matrix kernels.

The reference's matrix test suites (tests/LinAlg/matrixTestsDense*.hpp,
matrixTestsSparse*.hpp, matrixTestsSymSparse*.hpp — SURVEY.md §4 tier 1)
run one abstract semantic suite against every backend implementation.
Here the same discipline for this framework's matrix substrate: the
triplet (COO) sparse kernels, the KKT assembly algebra, and the Cholesky
backend dispatch are each checked against plain numpy/scipy semantics
under eager and jit execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from hiop_tpu.linalg.sparse import TripletMatrix
from hiop_tpu.kkt import newton_dense as kkt_nd
from hiop_tpu.kkt import mds as kkt_mds

BACKENDS = ["eager", "jit"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def run(backend, fn, *args):
    if backend == "jit":
        fn = jax.jit(fn)
    return jax.tree.map(np.asarray, fn(*args))


def _triplet(seed, m=13, n=17, nnz=40, dups=True):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    if dups:  # duplicate entries must accumulate (segment-sum semantics)
        rows[-3:] = rows[0]
        cols[-3:] = cols[0]
    vals = rng.standard_normal(nnz)
    A = TripletMatrix(rows, cols, jnp.asarray(vals), (m, n))
    S = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
    return A, S, rng


def test_triplet_matvec(backend):
    A, S, rng = _triplet(0)
    v = rng.standard_normal(17)
    got = run(backend, lambda vv: A @ vv, jnp.asarray(v))
    np.testing.assert_allclose(got, S @ v, rtol=1e-13)


def test_triplet_transpose_matvec(backend):
    A, S, rng = _triplet(1)
    w = rng.standard_normal(13)
    got = run(backend, lambda ww: A.T @ ww, jnp.asarray(w))
    np.testing.assert_allclose(got, S.T @ w, rtol=1e-13)


def test_triplet_todense_and_with_values():
    A, S, rng = _triplet(2)
    np.testing.assert_allclose(np.asarray(A.todense()), S.toarray(), rtol=1e-14)
    v2 = rng.standard_normal(A.vals.shape[0])
    A2 = A.with_values(jnp.asarray(v2))
    S2 = sp.coo_matrix(
        (v2, (np.asarray(A.rows), np.asarray(A.cols))), shape=A.shape
    )
    np.testing.assert_allclose(np.asarray(A2.todense()), S2.toarray(), rtol=1e-14)


def test_triplet_empty_dims():
    A = TripletMatrix(np.zeros(0), np.zeros(0), jnp.zeros(0), (0, 5))
    assert (A @ jnp.ones(5)).shape == (0,)
    assert (A.T @ jnp.zeros(0)).shape == (5,)


def _kkt_blocks(seed, n=12, mc=3, md=4):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n, n))
    H = jnp.asarray(H + H.T)
    Dx = jnp.asarray(rng.uniform(0.5, 2.0, n))
    Dd = jnp.asarray(rng.uniform(0.5, 2.0, md))
    Jc = jnp.asarray(rng.standard_normal((mc, n)))
    Jd = jnp.asarray(rng.standard_normal((md, n)))
    return H, Dx, Dd, Jc, Jd, rng


def test_xdycyd_matvec_matches_assembled_matrix(backend):
    """The operator form used by the FGMRES inner IR must agree with the
    explicitly assembled 4-block XDYcYd matrix."""
    H, Dx, Dd, Jc, Jd, rng = _kkt_blocks(3)
    deltas = (0.1, 0.2, 0.3, 0.4)
    n, mc, md = 12, 3, 4
    dx = jnp.asarray(rng.standard_normal(n))
    dd = jnp.asarray(rng.standard_normal(md))
    dyc = jnp.asarray(rng.standard_normal(mc))
    dyd = jnp.asarray(rng.standard_normal(md))
    got = run(
        backend,
        lambda *a: kkt_nd.xdycyd_matvec(H, Dx, Dd, Jc, Jd, *deltas, *a),
        dx, dd, dyc, dyd,
    )
    M = np.asarray(kkt_nd.assemble_xdycyd(H, Dx, Dd, Jc, Jd, *deltas))
    want = M @ np.concatenate([dx, dd, dyc, dyd])
    flat = np.concatenate(got)
    np.testing.assert_allclose(flat, want, rtol=1e-12, atol=1e-12)


def test_quick_factorization_solves_assembled_system(backend):
    """Cholesky-Schur quick path == dense solve of the assembled matrix."""
    H, Dx, Dd, Jc, Jd, rng = _kkt_blocks(4)
    H = H @ H.T / 12 + 3 * jnp.eye(12)  # PD Hessian block
    deltas = (0.0, 0.0, 0.0, 0.0)
    n, mc, md = 12, 3, 4
    rx = rng.standard_normal(n)
    rd = rng.standard_normal(md)
    ryc = rng.standard_normal(mc)
    ryd = rng.standard_normal(md)

    def solve(rx_t, rd_t, ryc_t, ryd_t):
        f = kkt_nd.factorize_quick(H, Dx, Dd, Jc, Jd, *deltas)
        return kkt_nd.solve_quick(f, rx_t, rd_t, ryc_t, ryd_t)

    got = run(backend, solve, *(jnp.asarray(a) for a in (rx, rd, ryc, ryd)))
    M = np.asarray(kkt_nd.assemble_xdycyd(H, Dx, Dd, Jc, Jd, *deltas))
    want = np.linalg.solve(M, np.concatenate([rx, rd, ryc, ryd]))
    np.testing.assert_allclose(np.concatenate(got), want, rtol=1e-9, atol=1e-9)


def test_mds_factorization_solves_assembled_system(backend):
    """MDS three-factorization reduction == dense solve of the assembled
    [x_s, x_d, d, yc, yd] system (the reference's MDS Schur assembly,
    hiopKKTLinSysMDS.cpp:172-276, validated in one shot)."""
    rng = np.random.default_rng(5)
    ns2, nd, mc, md = 10, 6, 3, 4
    hss = jnp.asarray(rng.uniform(1.0, 2.0, ns2))
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + 2 * np.eye(nd))
    Dxs = jnp.asarray(rng.uniform(0.1, 1.0, ns2))
    Dxd = jnp.asarray(rng.uniform(0.1, 1.0, nd))
    Dd = jnp.asarray(rng.uniform(0.1, 1.0, md))
    Jc_s = jnp.asarray(rng.standard_normal((mc, ns2)))
    Jc_d = jnp.asarray(rng.standard_normal((mc, nd)))
    Jd_s = jnp.asarray(rng.standard_normal((md, ns2)))
    Jd_d = jnp.asarray(rng.standard_normal((md, nd)))
    rxs = rng.standard_normal(ns2)
    rxd = rng.standard_normal(nd)
    rd = rng.standard_normal(md)
    ryc = rng.standard_normal(mc)
    ryd = rng.standard_normal(md)

    def solve(*r):
        f = kkt_mds.factorize(
            hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jd_s, Jd_d, 0.0, 0.0, 0.0, 0.0
        )
        return kkt_mds.solve(f, *r)

    got = run(backend, solve, *(jnp.asarray(a) for a in (rxs, rxd, rd, ryc, ryd)))

    # assemble the full [x_s, x_d, d, yc, yd] system in numpy
    N = ns2 + nd + md + mc + md
    M = np.zeros((N, N))
    i_xs = slice(0, ns2)
    i_xd = slice(ns2, ns2 + nd)
    i_d = slice(ns2 + nd, ns2 + nd + md)
    i_yc = slice(ns2 + nd + md, ns2 + nd + md + mc)
    i_yd = slice(ns2 + nd + md + mc, N)
    M[i_xs, i_xs] = np.diag(np.asarray(hss + Dxs))
    M[i_xd, i_xd] = np.asarray(Hdd) + np.diag(np.asarray(Dxd))
    M[i_d, i_d] = np.diag(np.asarray(Dd))
    M[i_yc, i_xs] = np.asarray(Jc_s); M[i_xs, i_yc] = np.asarray(Jc_s).T
    M[i_yc, i_xd] = np.asarray(Jc_d); M[i_xd, i_yc] = np.asarray(Jc_d).T
    M[i_yd, i_xs] = np.asarray(Jd_s); M[i_xs, i_yd] = np.asarray(Jd_s).T
    M[i_yd, i_xd] = np.asarray(Jd_d); M[i_xd, i_yd] = np.asarray(Jd_d).T
    M[i_d, i_yd] = -np.eye(md); M[i_yd, i_d] = -np.eye(md)
    want = np.linalg.solve(M, np.concatenate([rxs, rxd, rd, ryc, ryd]))
    np.testing.assert_allclose(np.concatenate(got), want, rtol=1e-8, atol=1e-8)


def test_cholesky_backends_agree():
    """XLA vs Pallas(interpret-on-CPU) blocked Cholesky — the exec-policy
    axis of the reference's device-parameterized matrix tests."""
    from hiop_tpu.linalg import cholesky as chol_mod

    rng = np.random.default_rng(6)
    n = 256
    A = rng.standard_normal((n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n))
    L_xla = np.asarray(jnp.linalg.cholesky(A))
    L_pl = np.asarray(chol_mod.pallas_cholesky(A, interpret=True))
    np.testing.assert_allclose(L_pl, L_xla, rtol=1e-10, atol=1e-10)
