"""C interface loader.

Parity with the reference's C/Fortran interfaces
(/root/reference/src/Interface/hiopInterface.h, chiopInterface.cpp,
hiopFortranInterface.*): a user problem written in C (or any language with
a C ABI, including Fortran via iso_c_binding) is compiled to a shared
library exporting ``hiop_tpu_get_problem`` (see capi/hiop_tpu_c.h); this
module loads it with ctypes, wraps the function pointers into a
:class:`hiop_tpu.SparseProblem`, and solves it with the Newton IPM —
mirroring hiop_sparse_create_problem / hiop_sparse_solve_problem.

A complete C example lives at tests/data/c_problem_example.c and a
complete Fortran (iso_c_binding) example at
examples/fortran/sparse_fex1.f90 — the Fortran path needs no dedicated
shim layer (the reference's hiopFortranInterface.h role) because the C
ABI here is already iso_c_binding-clean.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from hiop_tpu.interface.base import (
    DenseConstraintsProblem,
    MdsProblem,
    SparseProblem,
)

_F64P = ctypes.POINTER(ctypes.c_double)
_I64P = ctypes.POINTER(ctypes.c_int64)


class _CProblemStruct(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("m", ctypes.c_int64),
        ("nnz_jac", ctypes.c_int64),
        ("nnz_hess", ctypes.c_int64),
        ("get_vars_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_cons_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_starting_point", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P)),
        ("eval_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_grad_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_cons", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_int64, _F64P, _F64P)),
        ("get_jac_structure", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _I64P, _I64P)),
        ("get_hess_structure", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _I64P, _I64P)),
        ("eval_jac", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, ctypes.c_int64, _F64P)),
        (
            "eval_hess",
            ctypes.CFUNCTYPE(
                ctypes.c_int, ctypes.c_int64, _F64P, ctypes.c_double,
                ctypes.c_int64, _F64P, ctypes.c_int64, _F64P,
            ),
        ),
    ]


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(_F64P)


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


class CSparseProblem(SparseProblem):
    """A SparseProblem backed by C callbacks (host evaluations).

    Evaluations copy x to host, call the C function, and return numpy
    arrays — the reference's ``callback_mem_space=host`` mode; the solver's
    linear algebra still runs on device.
    """

    jittable = False

    def __init__(self, lib_path: str):
        self._dll = ctypes.CDLL(lib_path)
        self._dll.hiop_tpu_get_problem.restype = ctypes.POINTER(_CProblemStruct)
        self._p = self._dll.hiop_tpu_get_problem().contents
        self.n = int(self._p.n)
        self.m = int(self._p.m)
        self.nnz_jac = int(self._p.nnz_jac)
        self.nnz_hess = int(self._p.nnz_hess)

    def _check(self, ret: int, what: str):
        if ret != 0:
            raise RuntimeError(f"C callback {what} returned {ret}")

    def get_prob_sizes(self):
        return self.n, self.m

    def get_vars_info(self):
        xl = np.empty(self.n)
        xu = np.empty(self.n)
        self._check(self._p.get_vars_info(self.n, _dptr(xl), _dptr(xu)), "get_vars_info")
        return xl, xu

    def get_cons_info(self):
        cl = np.empty(self.m)
        cu = np.empty(self.m)
        self._check(self._p.get_cons_info(self.m, _dptr(cl), _dptr(cu)), "get_cons_info")
        return cl, cu

    def get_starting_point(self):
        x0 = np.empty(self.n)
        self._check(self._p.get_starting_point(self.n, _dptr(x0)), "get_starting_point")
        return x0

    def get_sparse_blocks_info(self):
        return self.n, self.nnz_jac, self.nnz_hess

    def jac_structure(self):
        i = np.empty(self.nnz_jac, np.int64)
        j = np.empty(self.nnz_jac, np.int64)
        self._check(self._p.get_jac_structure(self.nnz_jac, _iptr(i), _iptr(j)), "get_jac_structure")
        return i, j

    def hess_structure(self):
        i = np.empty(self.nnz_hess, np.int64)
        j = np.empty(self.nnz_hess, np.int64)
        self._check(self._p.get_hess_structure(self.nnz_hess, _iptr(i), _iptr(j)), "get_hess_structure")
        return i, j

    def eval_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        out = np.empty(1)
        self._check(self._p.eval_f(self.n, _dptr(xh), _dptr(out)), "eval_f")
        return out[0]

    def eval_grad_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        g = np.empty(self.n)
        self._check(self._p.eval_grad_f(self.n, _dptr(xh), _dptr(g)), "eval_grad_f")
        return g

    def eval_cons(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        c = np.empty(self.m)
        self._check(self._p.eval_cons(self.n, self.m, _dptr(xh), _dptr(c)), "eval_cons")
        return c

    def eval_jac_vals(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        v = np.empty(self.nnz_jac)
        self._check(self._p.eval_jac(self.n, _dptr(xh), self.nnz_jac, _dptr(v)), "eval_jac")
        return v

    def eval_hess_vals(self, x, obj_factor, lam):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        lh = np.ascontiguousarray(np.asarray(lam, dtype=np.float64))
        v = np.empty(self.nnz_hess)
        self._check(
            self._p.eval_hess(
                self.n, _dptr(xh), float(obj_factor), self.m, _dptr(lh),
                self.nnz_hess, _dptr(v),
            ),
            "eval_hess",
        )
        return v


def solve_sparse_problem(lib_path: str, **options):
    """hiop_sparse_create_problem + solve_problem in one call: load the C
    problem, run the Newton IPM, return the SolverResult."""
    from hiop_tpu import FilterIPMNewton, NlpOptions, NlpSparse

    prob = CSparseProblem(lib_path)
    o = NlpOptions()
    o.update(Hessian="analytical_exact", **options)
    nlp = NlpSparse(prob, o)
    return FilterIPMNewton(nlp).run()


# ---------------------------------------------------------------------------
# dense-constrained C problems (hiop_dense_create_problem parity)
# ---------------------------------------------------------------------------
class _CDenseStruct(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("m", ctypes.c_int64),
        ("get_vars_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_cons_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_starting_point", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P)),
        ("eval_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_grad_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_cons", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_int64, _F64P, _F64P)),
        ("eval_jac_cons", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_int64, _F64P, _F64P)),
    ]


class CDenseProblem(DenseConstraintsProblem):
    """A DenseConstraintsProblem backed by C callbacks (host evaluations);
    parity with the reference's dense C interface (hiopInterface.h:150)."""

    jittable = False

    def __init__(self, lib_path: str):
        self._dll = ctypes.CDLL(lib_path)
        self._dll.hiop_tpu_get_dense_problem.restype = ctypes.POINTER(_CDenseStruct)
        self._p = self._dll.hiop_tpu_get_dense_problem().contents
        self.n = int(self._p.n)
        self.m = int(self._p.m)

    def _check(self, ret: int, what: str):
        if ret != 0:
            raise RuntimeError(f"C callback {what} returned {ret}")

    def get_prob_sizes(self):
        return self.n, self.m

    def get_vars_info(self):
        xl, xu = np.empty(self.n), np.empty(self.n)
        self._check(self._p.get_vars_info(self.n, _dptr(xl), _dptr(xu)), "get_vars_info")
        return xl, xu

    def get_cons_info(self):
        cl, cu = np.empty(self.m), np.empty(self.m)
        self._check(self._p.get_cons_info(self.m, _dptr(cl), _dptr(cu)), "get_cons_info")
        return cl, cu

    def get_starting_point(self):
        x0 = np.empty(self.n)
        self._check(self._p.get_starting_point(self.n, _dptr(x0)), "get_starting_point")
        return x0

    def eval_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        out = np.empty(1)
        self._check(self._p.eval_f(self.n, _dptr(xh), _dptr(out)), "eval_f")
        return out[0]

    def eval_grad_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        g = np.empty(self.n)
        self._check(self._p.eval_grad_f(self.n, _dptr(xh), _dptr(g)), "eval_grad_f")
        return g

    def eval_cons(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        c = np.empty(self.m)
        self._check(self._p.eval_cons(self.n, self.m, _dptr(xh), _dptr(c)), "eval_cons")
        return c

    def eval_jac_cons(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        jac = np.empty((self.m, self.n))
        self._check(
            self._p.eval_jac_cons(self.n, self.m, _dptr(xh), _dptr(jac)),
            "eval_jac_cons",
        )
        return jac


def solve_dense_problem(lib_path: str, **options):
    """hiop_dense_create_problem + solve_problem in one call: load the C
    problem and run the quasi-Newton IPM (the reference solves dense C
    problems with hiopAlgFilterIPMQuasiNewton, chiopInterface.cpp)."""
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    prob = CDenseProblem(lib_path)
    o = NlpOptions()
    o.update(**options)
    nlp = NlpDenseConstraints(prob, o)
    return FilterIPMQuasiNewton(nlp).run()


# ---------------------------------------------------------------------------
# mixed dense-sparse C problems (hiop_mds_create_problem parity)
# ---------------------------------------------------------------------------
class _CMdsStruct(ctypes.Structure):
    _fields_ = [
        ("n_sparse", ctypes.c_int64),
        ("n_dense", ctypes.c_int64),
        ("m", ctypes.c_int64),
        ("nnz_jac_sparse", ctypes.c_int64),
        ("get_vars_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_cons_info", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("get_starting_point", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P)),
        ("eval_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_grad_f", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, _F64P)),
        ("eval_cons", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_int64, _F64P, _F64P)),
        ("get_jac_sparse_structure", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _I64P, _I64P)),
        (
            "eval_jac_blocks",
            ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, _F64P, ctypes.c_int64, _F64P, _F64P),
        ),
        (
            "eval_hess_blocks",
            ctypes.CFUNCTYPE(
                ctypes.c_int, ctypes.c_int64, _F64P, ctypes.c_double,
                ctypes.c_int64, _F64P, _F64P, _F64P,
            ),
        ),
    ]


class CMdsProblem(MdsProblem):
    """An MdsProblem backed by C callbacks (host evaluations); parity with
    the reference's MDS C interface (hiopInterface.h:63)."""

    jittable = False

    def __init__(self, lib_path: str):
        self._dll = ctypes.CDLL(lib_path)
        self._dll.hiop_tpu_get_mds_problem.restype = ctypes.POINTER(_CMdsStruct)
        self._p = self._dll.hiop_tpu_get_mds_problem().contents
        self.n_sparse = int(self._p.n_sparse)
        self.n_dense = int(self._p.n_dense)
        self.n = self.n_sparse + self.n_dense
        self.m = int(self._p.m)
        self.nnz_jac_sparse = int(self._p.nnz_jac_sparse)

    def _check(self, ret: int, what: str):
        if ret != 0:
            raise RuntimeError(f"C callback {what} returned {ret}")

    def get_prob_sizes(self):
        return self.n, self.m

    def get_sparse_dense_blocks_info(self):
        return self.n_sparse, self.n_dense

    def get_vars_info(self):
        xl, xu = np.empty(self.n), np.empty(self.n)
        self._check(self._p.get_vars_info(self.n, _dptr(xl), _dptr(xu)), "get_vars_info")
        return xl, xu

    def get_cons_info(self):
        cl, cu = np.empty(self.m), np.empty(self.m)
        self._check(self._p.get_cons_info(self.m, _dptr(cl), _dptr(cu)), "get_cons_info")
        return cl, cu

    def get_starting_point(self):
        x0 = np.empty(self.n)
        self._check(self._p.get_starting_point(self.n, _dptr(x0)), "get_starting_point")
        return x0

    def eval_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        out = np.empty(1)
        self._check(self._p.eval_f(self.n, _dptr(xh), _dptr(out)), "eval_f")
        return out[0]

    def eval_grad_f(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        g = np.empty(self.n)
        self._check(self._p.eval_grad_f(self.n, _dptr(xh), _dptr(g)), "eval_grad_f")
        return g

    def eval_cons(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        c = np.empty(self.m)
        self._check(self._p.eval_cons(self.n, self.m, _dptr(xh), _dptr(c)), "eval_cons")
        return c

    def jac_sparse_structure(self):
        i = np.empty(self.nnz_jac_sparse, np.int64)
        j = np.empty(self.nnz_jac_sparse, np.int64)
        self._check(
            self._p.get_jac_sparse_structure(self.nnz_jac_sparse, _iptr(i), _iptr(j)),
            "get_jac_sparse_structure",
        )
        return i, j

    def eval_jac_blocks(self, x):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        sv = np.empty(self.nnz_jac_sparse)
        db = np.empty((self.m, self.n_dense))
        self._check(
            self._p.eval_jac_blocks(self.n, _dptr(xh), self.nnz_jac_sparse, _dptr(sv), _dptr(db)),
            "eval_jac_blocks",
        )
        return sv, db

    def eval_hess_blocks(self, x, obj_factor, lam):
        xh = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        lh = np.ascontiguousarray(np.asarray(lam, dtype=np.float64))
        hss = np.empty(self.n_sparse)
        hdd = np.empty((self.n_dense, self.n_dense))
        self._check(
            self._p.eval_hess_blocks(
                self.n, _dptr(xh), float(obj_factor), self.m, _dptr(lh),
                _dptr(hss), _dptr(hdd),
            ),
            "eval_hess_blocks",
        )
        return hss, hdd


def solve_mds_problem(lib_path: str, **options):
    """hiop_mds_create_problem + solve_problem in one call: load the C
    problem and run the Newton IPM on the MDS formulation."""
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions

    prob = CMdsProblem(lib_path)
    o = NlpOptions()
    o.update(Hessian="analytical_exact", **options)
    nlp = NlpMDS(prob, o)
    return FilterIPMNewton(nlp).run()
