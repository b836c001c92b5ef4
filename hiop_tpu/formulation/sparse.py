"""Sparse NLP formulation (hiopNlpSparse, hiopNlpFormulation.hpp:565).

Holds static triplet structure for the Jacobian and (upper-triangle)
Lagrangian Hessian; per-iteration only values are evaluated. The structure
is split once at construction into equality/inequality row groups (static
index arrays), so per-iteration work is pure gathers/segment-sums — no
dynamic shapes under jit. Full Newton-path support (KKT assembly) lands in
build stage 3."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from hiop_tpu.formulation.base import NlpFormulation


class NlpSparse(NlpFormulation):
    def finalize_initialization(self) -> None:
        super().finalize_initialization()
        p = self.problem
        jr, jc = (np.asarray(a) for a in p.jac_structure())
        self.jac_rows = jr
        self.jac_cols = jc
        # split triplets by eq/ineq rows (static)
        eq_set = np.zeros(self.m, dtype=bool)
        eq_set[self.eq_idx] = True
        self._jac_is_eq = eq_set[jr]
        # row remapping into the eq / ineq blocks
        eq_rank = np.full(self.m, -1)
        eq_rank[self.eq_idx] = np.arange(self.m_eq)
        in_rank = np.full(self.m, -1)
        in_rank[self.ineq_idx] = np.arange(self.m_ineq)
        self.jac_eq_rows = eq_rank[jr[self._jac_is_eq]]
        self.jac_eq_cols = jc[self._jac_is_eq]
        self.jac_in_rows = in_rank[jr[~self._jac_is_eq]]
        self.jac_in_cols = jc[~self._jac_is_eq]
        hr, hc = (np.asarray(a) for a in p.hess_structure())
        self.hess_rows = hr
        self.hess_cols = hc

    def maybe_setup_scaling(self, x0) -> None:
        if self._scaling_done:
            return
        grad0 = np.asarray(self.problem.eval_grad_f(x0))
        vals = np.abs(np.asarray(self.problem.eval_jac_vals(x0)))
        row_norms = np.zeros(self.m)
        np.maximum.at(row_norms, self.jac_rows, vals)
        self._setup_scaling(grad0, row_norms)

    @property
    def matrix_free(self) -> bool:
        """True when the Jacobian must stay in triplet form: explicit
        ``linear_solver_sparse`` in {cg, bicgstab}, or 'auto' with a large
        variable count (dense (m, n) materialization would be O(n^2))."""
        ls = self.options.str_("linear_solver_sparse")
        if ls in ("cg", "bicgstab"):
            return True
        if ls != "auto":
            from hiop_tpu.linalg import solver_registry

            # registry-backed sparse direct solvers (splu / user bridges)
            # consume triplet values; never densify the Jacobian for them
            if solver_registry.has_solver(ls):
                return True
        return ls == "auto" and self.n >= 8192

    def eval_jac(self, x):
        """Returns (Jc, Jd): scaled dense arrays for moderate n, or
        :class:`TripletMatrix` handles (O(nnz) matvecs, no densification)
        in matrix-free mode."""
        if self.matrix_free:
            from hiop_tpu.linalg.sparse import TripletMatrix

            if getattr(self.problem, "jac_constant", False):
                cached = getattr(self, "_jac_cache_mf", None)
                if cached is not None:
                    return cached
            vals_eq, vals_in = self.eval_jac_vals_split(x)
            out = (
                TripletMatrix(self.jac_eq_rows, self.jac_eq_cols, vals_eq, (self.m_eq, self.n)),
                TripletMatrix(self.jac_in_rows, self.jac_in_cols, vals_in, (self.m_ineq, self.n)),
            )
            if getattr(self.problem, "jac_constant", False):
                self._jac_cache_mf = out
            return out
        if getattr(self.problem, "jac_constant", False):
            cached = getattr(self, "_jac_cache", None)
            if cached is not None:
                return cached
        vals_eq, vals_in = self.eval_jac_vals_split(x)
        Jc = jnp.zeros((self.m_eq, self.n), x.dtype).at[
            self.jac_eq_rows, self.jac_eq_cols
        ].add(vals_eq)
        Jd = jnp.zeros((self.m_ineq, self.n), x.dtype).at[
            self.jac_in_rows, self.jac_in_cols
        ].add(vals_in)
        if getattr(self.problem, "jac_constant", False):
            self._jac_cache = (Jc, Jd)
        return Jc, Jd

    def eval_jac_vals_split(self, x):
        """Scaled triplet values split into (eq, ineq) groups."""
        self.runstats.n_eval_jac += 1
        with self.runstats.tm_eval_jac:
            vals = jnp.asarray(self.problem.eval_jac_vals(x))
        scale = jnp.asarray(self._scale_cons)[self.jac_rows]
        vals = vals * scale
        return vals[self._jac_is_eq], vals[~self._jac_is_eq]

    def eval_hess_vals(self, x, obj_factor, yc, yd):
        """Scaled upper-triangle Hessian triplet values; lam recombined from
        (yc, yd) into user constraint order."""
        self.runstats.n_eval_hess += 1
        lam = self._lam_user_order(yc, yd)
        with self.runstats.tm_eval_hess:
            vals = jnp.asarray(
                self.problem.eval_hess_vals(x, obj_factor * self.scale_obj, lam)
            )
        return vals

    def eval_hess(self, x, obj_factor, yc, yd):
        """Dense symmetric Hessian assembled from the upper-triangle triplets
        (scatter-add; static structure -> fully jit-friendly). The sparse
        Newton KKT consumes this dense form on TPU, where a moderate dense
        Cholesky beats any pivoted sparse factorization (SURVEY.md §7 stage
        3 design note)."""
        vals = self.eval_hess_vals(x, obj_factor, yc, yd)
        n = self.n
        U = jnp.zeros((n, n), vals.dtype).at[self.hess_rows, self.hess_cols].add(vals)
        return U + U.T - jnp.diag(jnp.diag(U))
