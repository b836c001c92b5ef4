"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu.linalg.cholesky import pallas_cholesky, cholesky, set_backend


@pytest.mark.parametrize("n,dtype,tol", [(128, jnp.float64, 1e-10), (256, jnp.float64, 1e-10), (256, jnp.float32, 1e-3)])
def test_pallas_cholesky_matches_xla(n, dtype, tol):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n), dtype)
    L = pallas_cholesky(A, interpret=True)
    Lref = jnp.linalg.cholesky(A)
    assert float(jnp.max(jnp.abs(L - Lref))) < tol
    # valid lower factor
    assert float(jnp.max(jnp.abs(jnp.tril(L) @ jnp.tril(L).T - A))) < tol * n


def test_dispatch_falls_back_for_unaligned_sizes():
    set_backend("pallas")
    try:
        A = jnp.eye(50) * 4.0
        L = cholesky(A)  # 50 not divisible by 128 -> XLA path
        assert np.allclose(np.asarray(jnp.diag(L)), 2.0)
    finally:
        set_backend("xla")


def test_mixed_precision_factorization_solves():
    import examples.sparse_ex1 as sx1

    r = sx1.solve(50, verbosity_level=0, kkt_fact_dtype="float32")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert abs((r.obj - ref) / (1 + ref)) <= tol


@pytest.mark.parametrize("n", [128, 200, 256])
def test_pallas_ldl_matches_xla_path(n):
    from hiop_tpu.linalg import ldl_blocked as ldl

    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n))
    M = jnp.asarray(A + A.T)
    f_xla = ldl._ldl_factor_impl(M, use_pallas=False, interpret=False)
    f_pl = ldl._ldl_factor_impl(M, use_pallas=True, interpret=True)
    assert bool(f_xla.ok) and bool(f_pl.ok)
    assert int(f_xla.n_neg) == int(f_pl.n_neg)
    assert float(jnp.max(jnp.abs(f_xla.L - f_pl.L))) < 1e-9
    assert float(jnp.max(jnp.abs(f_xla.d - f_pl.d))) < 1e-9


def test_ldl_backend_dispatch():
    from hiop_tpu.linalg import ldl_blocked as ldl

    set_backend("pallas")
    try:
        rng = np.random.default_rng(1)
        A = rng.standard_normal((64, 64))
        M = jnp.asarray(A + A.T)
        f = ldl.ldl_factor(M)  # padded to 128, pallas (interpret on CPU)
        w = np.linalg.eigvalsh(np.asarray(M))
        assert int(f.n_neg) == int(np.sum(w < 0))
        b = jnp.asarray(rng.standard_normal(64))
        x = ldl.ldl_solve(f, b)
        assert np.linalg.norm(np.asarray(M @ x - b)) < 1e-8
    finally:
        set_backend("xla")


def test_mds_driver_pallas_exec_policy():
    """Driver-level exec_policies=pallas run (the reference's RAJA-variant
    driver role, NlpMdsRajaEx1): mixed-precision f32 factorizations through
    the Pallas Cholesky (interpret mode on CPU), same converged objective
    as the default backend within the tolerance."""
    import examples.mds_ex1 as mx1

    r_pl = mx1.solve(
        128, 128, verbosity_level=0,
        exec_policies="pallas", kkt_fact_dtype="float32", jit_mode="none",
    )
    r_ref = mx1.solve(128, 128, verbosity_level=0, jit_mode="none")
    assert r_pl.status.is_success and r_ref.status.is_success
    assert abs(r_pl.obj - r_ref.obj) < 1e-4 * max(1.0, abs(r_ref.obj))
