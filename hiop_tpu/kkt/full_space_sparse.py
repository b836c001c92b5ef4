"""Sparse direct solve of the full (unreduced) 12-block KKT system.

Parity with ``hiopKKTLinSysSparseFull``
(/root/reference/src/Optimization/hiopKKTLinSysSparse.hpp:202): the
reference assembles the nonsymmetric unreduced primal-dual system (block
doc hiopKKTLinSys.hpp:463-501) in triplet form and hands it to a
NONsymmetric sparse direct solver (PARDISO/STRUMPACK,
hiopKKTLinSysSparse.cpp:845-849).  Here the matrix is assembled as a
scipy COO matrix straight from the formulation's Hessian/Jacobian
TRIPLETS — never materializing a dense operator (the round-1 realization
batched the operator over the identity, an O(N^2) memory wall at large n)
— and factorized by a registry-selected sparse LU (``splu`` = SuperLU by
default).  Every off-triplet block of the system is diagonal (barrier
slack/dual couplings), so assembly is O(nnz(H) + nnz(J) + N).

The row/column ordering matches :mod:`hiop_tpu.kkt.full_space`'s compound
flattening [x, d, yc, yd, sxl, sxu, sdl, sdu, zl, zu, vl, vu] (the
reference's hiopVectorCompoundPD layout), and inactive bound rows carry a
unit diagonal so the decoupled entries solve to zero — identical semantics
to ``full_space.assemble_full``, verified entry-by-entry at a live iterate
by tests/test_kkt_variants.py::test_full_kkt_coo_assembly_matches_dense_operator.

No inertia is available from a nonsymmetric LU, so callers pair this with
the inertia-free curvature acceptor — the same constraint the reference's
PARDISO-nonsym branch documents.
"""

from __future__ import annotations

import numpy as np

from hiop_tpu.kkt.full_space import _flatten_res, _unflatten_dir, residual_to_rhs


class SparseFullKKT:
    """Static-pattern sparse assembler + registry LU for the unreduced KKT.

    The sparsity pattern (H triplets mirrored + J/J^T + the diagonal
    slack/dual couplings) is precomputed once; per-iteration factorization
    refreshes only the value vector — the reference's symbolic-once /
    numeric-per-iteration flow.
    """

    def __init__(self, nlp, solver_name: str = "splu"):
        import functools
        import inspect

        from hiop_tpu.linalg import solver_registry

        factory = solver_registry.get_solver_factory(solver_name)
        if "ordering" in inspect.signature(factory).parameters:
            factory = functools.partial(
                factory, ordering=nlp.options.str_("linear_solver_sparse_ordering")
            )
        self._factory = factory
        n, me, mi = nlp.n, nlp.m_eq, nlp.m_ineq
        self.n, self.m_eq, self.m_ineq = n, me, mi
        sizes = [n, mi, me, mi, n, n, mi, mi, n, n, mi, mi]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        (x0, d0, yc0, yd0, sxl0, sxu0, sdl0, sdu0,
         zl0, zu0, vl0, vu0) = offs[:12]
        self.ntot = int(offs[12])
        self._offs = offs

        hr = np.asarray(nlp.hess_rows)
        hc = np.asarray(nlp.hess_cols)
        jer = np.asarray(nlp.jac_eq_rows)
        jec = np.asarray(nlp.jac_eq_cols)
        jir = np.asarray(nlp.jac_in_rows)
        jic = np.asarray(nlp.jac_in_cols)
        off = hr != hc  # H upper triplets mirrored below the diagonal
        self._off = off

        ix = np.arange(n)
        im = np.arange(mi)
        ie = np.arange(me)

        rows, cols = [], []
        # x rows: H + H^T-mirror + delta_wx diag + Jc^T + Jd^T - zl + zu
        rows += [hr, hc[off], ix, jec, jic, ix, ix]
        cols += [hc, hr[off], ix, yc0 + jer, yd0 + jir, zl0 + ix, zu0 + ix]
        # d rows: delta_wd diag - yd - vl + vu
        rows += [d0 + im, d0 + im, d0 + im, d0 + im]
        cols += [d0 + im, yd0 + im, vl0 + im, vu0 + im]
        # yc rows: Jc - delta_cc diag
        rows += [yc0 + jer, yc0 + ie]
        cols += [jec, yc0 + ie]
        # yd rows: Jd - I_d - delta_cd diag
        rows += [yd0 + jir, yd0 + im, yd0 + im]
        cols += [jic, d0 + im, yd0 + im]
        # bound rows sxl/sxu/sdl/sdu: +/- x (or d) and the slack diagonal
        rows += [sxl0 + ix, sxl0 + ix]
        cols += [x0 + ix, sxl0 + ix]
        rows += [sxu0 + ix, sxu0 + ix]
        cols += [x0 + ix, sxu0 + ix]
        rows += [sdl0 + im, sdl0 + im]
        cols += [d0 + im, sdl0 + im]
        rows += [sdu0 + im, sdu0 + im]
        cols += [d0 + im, sdu0 + im]
        # complementarity rows zl/zu/vl/vu: dual*dslack + slack*ddual
        rows += [zl0 + ix, zl0 + ix]
        cols += [sxl0 + ix, zl0 + ix]
        rows += [zu0 + ix, zu0 + ix]
        cols += [sxu0 + ix, zu0 + ix]
        rows += [vl0 + im, vl0 + im]
        cols += [sdl0 + im, vl0 + im]
        rows += [vu0 + im, vu0 + im]
        cols += [sdu0 + im, vu0 + im]
        self._rows = np.concatenate(rows).astype(np.int64)
        self._cols = np.concatenate(cols).astype(np.int64)
        self._solver = None
        self._template = None

    def _values(self, hvals, je_vals, ji_vals, it, b, deltas):
        dwx, dwd, dcc, dcd = deltas
        n, me, mi = self.n, self.m_eq, self.m_ineq
        ixl = np.asarray(b.ixl, dtype=np.float64)
        ixu = np.asarray(b.ixu, dtype=np.float64)
        idl = np.asarray(b.idl, dtype=np.float64)
        idu = np.asarray(b.idu, dtype=np.float64)
        one = 1.0
        return np.concatenate([
            hvals, hvals[self._off],
            np.full(n, dwx),
            je_vals, ji_vals,
            np.full(n, -1.0), np.full(n, 1.0),                # -zl +zu
            np.full(mi, dwd),
            np.full(mi, -1.0), np.full(mi, -1.0), np.full(mi, 1.0),
            je_vals, np.full(me, -dcc),
            ji_vals, np.full(mi, -1.0), np.full(mi, -dcd),
            # bound rows: active -> (x - sxl) etc.; inactive -> unit diag
            ixl, one - 2.0 * ixl,
            -ixu, one - 2.0 * ixu,
            idl, one - 2.0 * idl,
            -idu, one - 2.0 * idu,
            # complementarity rows: active -> dual*dslack + slack*ddual
            ixl * np.asarray(it.zl), ixl * np.asarray(it.sxl) + (one - ixl),
            ixu * np.asarray(it.zu), ixu * np.asarray(it.sxu) + (one - ixu),
            idl * np.asarray(it.vl), idl * np.asarray(it.sdl) + (one - idl),
            idu * np.asarray(it.vu), idu * np.asarray(it.sdu) + (one - idu),
        ])

    def factorize(self, hvals, je_vals, ji_vals, it, b, deltas) -> bool:
        import scipy.sparse as sp

        vals = self._values(
            np.asarray(hvals, dtype=np.float64),
            np.asarray(je_vals, dtype=np.float64),
            np.asarray(ji_vals, dtype=np.float64),
            it, b, deltas,
        )
        A = sp.coo_matrix(
            (vals, (self._rows, self._cols)), shape=(self.ntot, self.ntot)
        ).tocsc()
        self._template = it
        try:
            self._solver = self._factory(A)
        except RuntimeError:
            self._solver = None
            return False
        return True

    def solve(self, resid):
        """Direction Iterate from a Residual (rhs sign fixups included)."""
        import jax.numpy as jnp

        rhs = np.asarray(_flatten_res(residual_to_rhs(resid)))
        sol = self._solver.solve(rhs)
        if not np.all(np.isfinite(sol)):
            return None
        return _unflatten_dir(jnp.asarray(sol), self._template)
