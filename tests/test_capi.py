"""C interface tests: compile the example C problem and solve it."""

import os
import shutil
import subprocess
import tempfile

import pytest

import examples.sparse_ex1 as sx1
from hiop_tpu import capi

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def c_problem_lib(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("g++") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    out = str(tmp_path_factory.mktemp("capi") / "c_problem_example.so")
    src = os.path.join(_HERE, "data", "c_problem_example.c")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", src, "-o", out, "-lm"],
        check=True, capture_output=True,
    )
    return out


def test_c_problem_solves_to_reference_objective(c_problem_lib):
    r = capi.solve_sparse_problem(c_problem_lib, verbosity_level=0)
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert abs((r.obj - ref) / (1 + ref)) <= tol


def test_c_problem_struct_fields(c_problem_lib):
    p = capi.CSparseProblem(c_problem_lib)
    assert p.get_prob_sizes() == (50, 49)
    xl, xu = p.get_vars_info()
    assert xl[2] == 1.5 and xu[2] == 10.0
    i, j = p.jac_structure()
    assert i.size == p.nnz_jac


# ---------------------------------------------------------------------------
# dense C interface (hiop_dense_create_problem parity)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def c_dense_lib(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("g++") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    out = str(tmp_path_factory.mktemp("capi") / "c_dense_problem_example.so")
    src = os.path.join(_HERE, "data", "c_dense_problem_example.c")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", src, "-o", out, "-lm"],
        check=True, capture_output=True,
    )
    return out


def test_c_dense_problem_solves_to_analytic_objective(c_dense_lib):
    # min sum 0.5(x-1)^2 s.t. sum x = n/2 has optimum x_i=1/2, obj = n/8
    r = capi.solve_dense_problem(c_dense_lib, verbosity_level=0)
    assert r.status.is_success
    assert abs(r.obj - 20 / 8.0) < 1e-6


# ---------------------------------------------------------------------------
# MDS C interface (hiop_mds_create_problem parity)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def c_mds_lib(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("g++") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    out = str(tmp_path_factory.mktemp("capi") / "c_mds_problem_example.so")
    src = os.path.join(_HERE, "data", "c_mds_problem_example.c")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", src, "-o", out, "-lm"],
        check=True, capture_output=True,
    )
    return out


def test_c_mds_problem_matches_autodiff_solve(c_mds_lib):
    """Cross-validate the MDS C path against an autodiff dense Newton solve
    of the same mathematical problem (the reference's IpoptAdapter
    cross-check technique)."""
    import numpy as np
    import jax.numpy as jnp

    from hiop_tpu import (
        AutoDiffNlpProblem, FilterIPMNewton, NlpDenseConstraints, NlpOptions,
    )

    r_c = capi.solve_mds_problem(c_mds_lib, verbosity_level=0)
    assert r_c.status.is_success

    ns, nd = 6, 4

    def f(z):
        x, y = z[:ns], z[ns:]
        return (
            0.5 * jnp.sum((x - 1.0) ** 2)
            + 0.5 * jnp.sum(y**2)
            + 0.05 * jnp.sum(y) ** 2
        )

    def c(z):
        x, y = z[:ns], z[ns:]
        return jnp.stack([x[0] + jnp.sum(y), x[1] - y[0]])

    p = AutoDiffNlpProblem(
        f=f, c=c,
        xl=np.full(ns + nd, -2.0), xu=np.full(ns + nd, 2.0),
        cl=np.array([1.0, 0.0]), cu=np.array([1.0, 1e20]),
        x0=np.zeros(ns + nd),
    )
    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0)
    r_ad = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
    assert r_ad.status.is_success
    assert abs(r_c.obj - r_ad.obj) < 1e-6
