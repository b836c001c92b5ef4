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
