"""Transform tests: fixed-variable removal, Kron reduction, version."""

import numpy as np
import jax.numpy as jnp
import pytest

import examples.dense_ex3 as ex3
from hiop_tpu.utils.kron_reduction import KronReduction


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def test_fixed_var_remove_matches_relax():
    r_remove = ex3.solve(500, fixed_var="remove", verbosity_level=0)
    r_relax = ex3.solve(500, fixed_var="relax", verbosity_level=0)
    assert r_remove.status.is_success
    assert _rel(r_remove.obj, r_relax.obj) <= 1e-6
    # removed problem reports the reduced primal vector
    assert r_remove.x.size < 500


def test_fixed_var_remove_expand():
    from hiop_tpu.formulation.transforms import FixedVarsRemover

    class P:
        def get_prob_sizes(self):
            return 4, 0

        def get_vars_info(self):
            return np.array([0.0, 1.0, 0.0, 2.0]), np.array([5.0, 1.0, 5.0, 2.0])

        def get_cons_info(self):
            return np.zeros(0), np.zeros(0)

        def get_starting_point(self):
            return np.array([0.5, 1.0, 0.5, 2.0])

        def eval_f(self, x):
            return jnp.sum(x**2)

        def eval_grad_f(self, x):
            return 2 * x

        def eval_cons(self, x):
            return jnp.zeros(0)

        def eval_jac_cons(self, x):
            return jnp.zeros((0, 4))

    fixed = np.array([False, True, False, True])
    vals = np.array([0.0, 1.0, 0.0, 2.0])
    w = FixedVarsRemover(P(), fixed, vals)
    assert w.get_prob_sizes() == (2, 0)
    x_full = w.expand(jnp.array([3.0, 4.0]))
    assert np.allclose(np.asarray(x_full), [3.0, 1.0, 4.0, 2.0])
    g = w.eval_grad_f(jnp.array([3.0, 4.0]))
    assert np.allclose(np.asarray(g), [6.0, 8.0])


def test_kron_reduction_matches_dense_schur():
    rng = np.random.default_rng(0)
    n = 10
    Y = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Y = Y + n * np.eye(n)  # well conditioned
    aux = [2, 5, 7]
    kr = KronReduction(Y, aux)
    Yred = np.asarray(kr.reduce())
    keep = [i for i in range(n) if i not in aux]
    Yaa = Y[np.ix_(keep, keep)]
    Yab = Y[np.ix_(keep, aux)]
    Yba = Y[np.ix_(aux, keep)]
    Ybb = Y[np.ix_(aux, aux)]
    ref = Yaa - Yab @ np.linalg.solve(Ybb, Yba)
    assert np.allclose(Yred, ref, atol=1e-10)
    # voltage recovery: with v on non-aux, aux currents are zero:
    v = rng.standard_normal(len(keep)) + 1j * rng.standard_normal(len(keep))
    v_aux = np.asarray(kr.apply_nonaux_to_aux(v))
    i_aux = Yba @ v + Ybb @ v_aux
    assert np.allclose(i_aux, 0.0, atol=1e-10)


def test_kron_reduction_sparse_matches_dense():
    """The sparse complex path (hiopMatrixComplexSparseTriplet + UMFPACKZ
    parity) must produce the same reduction as the dense path."""
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n = 30
    # sparse-ish complex admittance: tridiagonal + a few off-band couplings
    Y = np.zeros((n, n), np.complex128)
    for i in range(n):
        Y[i, i] = 4.0 + 1j * 0.5
        if i + 1 < n:
            Y[i, i + 1] = Y[i + 1, i] = -1.0 + 0.2j
    Y[0, n - 1] = Y[n - 1, 0] = -0.5 + 0.1j
    aux = [3, 8, 15, 22]
    kr_dense = KronReduction(Y, aux)
    kr_sparse = KronReduction(sp.csr_matrix(Y), aux)
    assert np.allclose(
        np.asarray(kr_dense.reduce()), np.asarray(kr_sparse.reduce()), atol=1e-12
    )
    v = rng.standard_normal(n - len(aux)) + 1j * rng.standard_normal(n - len(aux))
    assert np.allclose(
        np.asarray(kr_dense.apply_nonaux_to_aux(v)),
        np.asarray(kr_sparse.apply_nonaux_to_aux(v)),
        atol=1e-12,
    )


def test_version():
    import hiop_tpu

    assert hiop_tpu.__version__
