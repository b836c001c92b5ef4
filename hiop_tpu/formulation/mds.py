"""Mixed dense-sparse NLP formulation (hiopNlpMDS, hiopNlpFormulation.hpp:485).

Variables ordered [x_sparse, x_dense]; Jacobians split into a sparse triplet
block and a dense block; Hessian is block-diagonal with a *diagonal* sparse
block — the structure the MDS KKT exploits to Schur-eliminate the sparse
variables into a dense condensed system (reference hiopKKTLinSysMDS.cpp:
172-276). Full support lands in build stage 4."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from hiop_tpu.formulation.base import NlpFormulation


class NlpMDS(NlpFormulation):
    def finalize_initialization(self) -> None:
        super().finalize_initialization()
        p = self.problem
        self.n_sparse, self.n_dense = p.get_sparse_dense_blocks_info()
        assert self.n_sparse + self.n_dense == self.n
        jr, jc = (np.asarray(a) for a in p.jac_sparse_structure())
        self.jac_sp_rows, self.jac_sp_cols = jr, jc
        eq_set = np.zeros(self.m, dtype=bool)
        eq_set[self.eq_idx] = True
        self._jac_is_eq = eq_set[jr]
        eq_rank = np.full(self.m, -1)
        eq_rank[self.eq_idx] = np.arange(self.m_eq)
        in_rank = np.full(self.m, -1)
        in_rank[self.ineq_idx] = np.arange(self.m_ineq)
        self.jac_sp_eq_rows = eq_rank[jr[self._jac_is_eq]]
        self.jac_sp_eq_cols = jc[self._jac_is_eq]
        self.jac_sp_in_rows = in_rank[jr[~self._jac_is_eq]]
        self.jac_sp_in_cols = jc[~self._jac_is_eq]

    def maybe_setup_scaling(self, x0) -> None:
        if self._scaling_done:
            return
        grad0 = np.asarray(self.problem.eval_grad_f(x0))
        sp_vals, dense_blk = self.problem.eval_jac_blocks(x0)
        row_norms = np.zeros(self.m)
        np.maximum.at(row_norms, self.jac_sp_rows, np.abs(np.asarray(sp_vals)))
        if self.m:
            dense_norms = np.max(np.abs(np.asarray(dense_blk)), axis=1) if self.n_dense else np.zeros(self.m)
            row_norms = np.maximum(row_norms, dense_norms)
        self._setup_scaling(grad0, row_norms)

    def eval_jac(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dense (m_eq, n)/(m_ineq, n) materialization for the generic paths;
        the MDS KKT consumes the blocks via eval_jac_blocks_split."""
        if getattr(self.problem, "jac_constant", False):
            cached = getattr(self, "_jac_cache", None)
            if cached is not None:
                return cached
        (veq, vin), De, Di = self.eval_jac_blocks_split(x)
        Jc = jnp.zeros((self.m_eq, self.n), x.dtype)
        Jd = jnp.zeros((self.m_ineq, self.n), x.dtype)
        if self.m_eq:
            Jc = Jc.at[self.jac_sp_eq_rows, self.jac_sp_eq_cols].add(veq)
            Jc = Jc.at[:, self.n_sparse:].set(De)
        if self.m_ineq:
            Jd = Jd.at[self.jac_sp_in_rows, self.jac_sp_in_cols].add(vin)
            Jd = Jd.at[:, self.n_sparse:].set(Di)
        if getattr(self.problem, "jac_constant", False):
            self._jac_cache = (Jc, Jd)
        return Jc, Jd

    def eval_jac_blocks_split(self, x):
        """Returns ((sp_vals_eq, sp_vals_ineq), dense_eq, dense_ineq), scaled."""
        self.runstats.n_eval_jac += 1
        with self.runstats.tm_eval_jac:
            sp_vals, dense_blk = self.problem.eval_jac_blocks(x)
        sp_vals = jnp.asarray(sp_vals) * jnp.asarray(self._scale_cons)[self.jac_sp_rows]
        dense_blk = jnp.asarray(dense_blk) * jnp.asarray(self._scale_cons)[:, None]
        return (
            (sp_vals[self._jac_is_eq], sp_vals[~self._jac_is_eq]),
            dense_blk[self.eq_idx, :],
            dense_blk[self.ineq_idx, :],
        )

    def eval_hess(self, x, obj_factor, yc, yd):
        """Dense Lagrangian Hessian materialized from the MDS blocks
        (diagonal sparse block + dense block). Serves the paths that need
        a full Hessian of an MDS problem — most importantly the nested
        feasibility-restoration solve (the reference dedicates
        hiopFRProbMDS to this, hiopFRProb.hpp:238; here the FR
        reformulation is block-agnostic and consumes the densified
        Hessian). O(n^2) memory, used only off the hot path."""
        hss, hdd = self.eval_hess_blocks(x, obj_factor, yc, yd)
        ns = self.n_sparse
        H = jnp.zeros((self.n, self.n), hdd.dtype)
        H = H.at[jnp.arange(ns), jnp.arange(ns)].set(hss)
        H = H.at[ns:, ns:].set(hdd)
        return H

    def eval_hess_blocks(self, x, obj_factor, yc, yd):
        """Returns (hss_diag, Hdd), scaled."""
        self.runstats.n_eval_hess += 1
        lam = jnp.zeros((self.m,), x.dtype)
        if self.m_eq:
            lam = lam.at[self.eq_idx].set(yc * self.scale_cons_eq)
        if self.m_ineq:
            lam = lam.at[self.ineq_idx].set(yd * self.scale_cons_ineq)
        with self.runstats.tm_eval_hess:
            hss, hdd = self.problem.eval_hess_blocks(
                x, obj_factor * self.scale_obj, lam
            )
        return jnp.asarray(hss), jnp.asarray(hdd)
