"""Feasibility restoration (FR) phase.

Parity with ``hiopFRProb{Sparse,MDS,Dense}`` and
``apply_feasibility_restoration`` (/root/reference/src/Optimization/
hiopFRProb.hpp:87,238,423, hiopFRProb.cpp ctor + iterate_callback): when the
line search collapses, pose the Ipopt §3.3 restoration NLP over
z = [x, p_e, n_e, p_i, n_i] (p, n >= 0):

  min  rho * sum(p + n) + zeta/2 * || D_R (x - x_ref) ||^2
  s.t. c_e(x) - p_e + n_e  = c_rhs
       dl <= c_i(x) - p_i + n_i <= du

with D_R = min(1/|x_ref|, 1), zeta = sqrt(mu_fr), rho = 1000, and
mu_fr = max(mu, ||infeasibility||_inf). The FR NLP is solved by a nested
IPM; its iterate callback terminates the nested solve as soon as the
*original* infeasibility drops below kappa_resto times its entry value and
the point is acceptable to the original filter.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from hiop_tpu.interface.base import INF, NlpProblem
from hiop_tpu.utils.logger import Verbosity

RHO = 1000.0  # penalty on p/n (reference hiopFRProb.cpp:132 "FIXME: option")


class FeasibilityRestorationProblem(NlpProblem):
    """The FR NLP, posed against the (scaled) base formulation.

    The Jacobian is dense-assembled: [J_base | -I | +I] blocks; the Hessian
    (Newton path) is blkdiag(H_base(x, 0, lam) + zeta*D_R^2, 0) — p/n enter
    linearly.
    """

    def __init__(self, base_form, x_ref, mu: float, nrmInf_feas_ref: float):
        self.base = base_form
        self.n_x = base_form.n
        self.m_eq = base_form.m_eq
        self.m_ineq = base_form.m_ineq
        self.m = self.m_eq + self.m_ineq
        self.n = self.n_x + 2 * self.m
        self.x_ref = jnp.asarray(x_ref)
        self.mu_fr = max(float(mu), float(nrmInf_feas_ref))
        self.zeta = float(np.sqrt(self.mu_fr))
        xr = np.abs(np.asarray(x_ref))
        self.DR = jnp.asarray(np.minimum(1.0 / np.maximum(xr, 1e-300), 1.0))
        # termination bookkeeping (set by the driver)
        self.kappa_resto = base_form.options.num("kappa_resto")
        self.nrmInf_feas_ref = float(nrmInf_feas_ref)
        self.orig_filter = None
        self.accepted: Optional[dict] = None
        self.jittable = getattr(base_form.problem, "jittable", False)

    # -- sizes / bounds -----------------------------------------------------
    def get_prob_sizes(self):
        return self.n, self.m

    def get_vars_info(self):
        xlb = np.asarray(self.base.bounds.xl)
        xub = np.asarray(self.base.bounds.xu)
        ixl = np.asarray(self.base.bounds.ixl)
        ixu = np.asarray(self.base.bounds.ixu)
        xl = np.where(ixl == 1.0, xlb, -INF)
        xu = np.where(ixu == 1.0, xub, INF)
        lo = np.concatenate([xl, np.zeros(2 * self.m)])
        hi = np.concatenate([xu, np.full(2 * self.m, INF)])
        return lo, hi

    def get_cons_info(self):
        crhs = np.asarray(self.base.crhs)
        bl = np.asarray(self.base.bounds.dl)
        bu = np.asarray(self.base.bounds.du)
        idl = np.asarray(self.base.bounds.idl)
        idu = np.asarray(self.base.bounds.idu)
        dl = np.where(idl == 1.0, bl, -INF)
        du = np.where(idu == 1.0, bu, INF)
        return np.concatenate([crhs, dl]), np.concatenate([crhs, du])

    def get_starting_point(self):
        """x = x_ref; p/n from the Ipopt (3.5)-(3.6) closed form."""
        c, d = self.base.eval_cons(self.x_ref)
        crhs = np.asarray(self.base.crhs)
        v_eq = np.asarray(c) - crhs
        dl = np.asarray(self.get_cons_info()[0])[self.m_eq:]
        du = np.asarray(self.get_cons_info()[1])[self.m_eq:]
        d_np = np.asarray(d)
        v_in = d_np - np.clip(d_np, dl, du)
        mu, rho = self.mu_fr, RHO

        def pn(v):
            t = (mu - rho * v) / (2 * rho)
            n = t + np.sqrt(t * t + mu * v / (2 * rho) + 1e-300 * (v == 0))
            n = np.maximum(n, 1e-12)
            p = np.maximum(v + n, 1e-12)
            return p, n

        pe, ne = pn(v_eq) if self.m_eq else (np.zeros(0), np.zeros(0))
        pi, ni = pn(v_in) if self.m_ineq else (np.zeros(0), np.zeros(0))
        return np.concatenate([np.asarray(self.x_ref), pe, ne, pi, ni])

    # -- evaluations --------------------------------------------------------
    def _split(self, z):
        nx, me, mi = self.n_x, self.m_eq, self.m_ineq
        x = z[:nx]
        pe = z[nx:nx + me]
        ne = z[nx + me:nx + 2 * me]
        pi = z[nx + 2 * me:nx + 2 * me + mi]
        ni = z[nx + 2 * me + mi:]
        return x, pe, ne, pi, ni

    def eval_f(self, z):
        x, pe, ne, pi, ni = self._split(z)
        dx = (x - self.x_ref) * self.DR
        return RHO * (jnp.sum(pe) + jnp.sum(ne) + jnp.sum(pi) + jnp.sum(ni)) + (
            0.5 * self.zeta * jnp.dot(dx, dx)
        )

    def eval_grad_f(self, z):
        x, *_ = self._split(z)
        gx = self.zeta * self.DR * self.DR * (x - self.x_ref)
        return jnp.concatenate([gx, jnp.full((2 * self.m,), RHO, z.dtype)])

    def eval_cons(self, z):
        x, pe, ne, pi, ni = self._split(z)
        c, d = self.base.eval_cons(x)
        return jnp.concatenate([c - pe + ne, d - pi + ni])

    def eval_jac_cons(self, z):
        x, *_ = self._split(z)
        Jc, Jd = self.base.eval_jac(x)
        me, mi = self.m_eq, self.m_ineq
        dt = z.dtype
        Ie = jnp.eye(me, dtype=dt)
        Ii = jnp.eye(mi, dtype=dt)
        Ze = jnp.zeros
        top = jnp.concatenate(
            [Jc, -Ie, Ie, Ze((me, mi), dt), Ze((me, mi), dt)], axis=1
        )
        bot = jnp.concatenate(
            [Jd, Ze((mi, me), dt), Ze((mi, me), dt), -Ii, Ii], axis=1
        )
        return jnp.concatenate([top, bot], axis=0)

    def eval_hess_lagr(self, z, obj_factor, lam):
        x, *_ = self._split(z)
        yc = lam[: self.m_eq]
        yd = lam[self.m_eq:]
        # base Hessian with zero objective contribution + FR proximal term
        Hx = self.base.eval_hess(x, 0.0, yc, yd)
        Hx = Hx + obj_factor * jnp.diag(self.zeta * self.DR * self.DR)
        n = self.n
        H = jnp.zeros((n, n), z.dtype)
        return H.at[: self.n_x, : self.n_x].set(Hx)

    # -- termination --------------------------------------------------------
    def iterate_callback(self, info) -> bool:
        """Stop the nested solve once the original problem's infeasibility is
        small enough and the point is not in the original filter
        (hiopFRProbSparse::iterate_callback)."""
        z = jnp.asarray(info.x)
        x, *_ = self._split(z)
        c, d = self.base.eval_cons(x)
        crhs = self.base.crhs
        # the FR solver's inequality slacks for the base-ineq rows
        s = jnp.asarray(info.s)
        d_base = s[-self.m_ineq:] if self.m_ineq else jnp.zeros((0,))
        v_eq = c - crhs
        v_in = d - d_base
        nrmInf = max(
            float(jnp.max(jnp.abs(v_eq))) if v_eq.size else 0.0,
            float(jnp.max(jnp.abs(v_in))) if v_in.size else 0.0,
        )
        if info.iter > 0 and nrmInf <= self.kappa_resto * self.nrmInf_feas_ref:
            theta_ori = float(jnp.sum(jnp.abs(v_eq)) + jnp.sum(jnp.abs(v_in)))
            if self.orig_filter is None or not self.orig_filter.contains(
                theta_ori, float("-inf")
            ):
                self.accepted = {
                    "x": np.asarray(x),
                    "d": np.asarray(d_base),
                    "theta": theta_ori,
                }
                return False  # stops the nested solver (User_Stopped)
        return True


class SparseFeasibilityRestorationProblem(FeasibilityRestorationProblem):
    """Sparse-preserving FR NLP (hiopFRProbSparse, hiopFRProb.hpp:87).

    The FR Jacobian [J_base | -I | +I] and Hessian blkdiag(H_base +
    zeta*D_R^2, 0) are posed in TRIPLET form against the base NlpSparse
    formulation's static structure — nnz(J) + 2m and nnz(H) + n entries —
    so the nested IPM routes through the sparse KKT strategies and never
    materializes the dense (m, n+2m) matrix the generic
    :class:`FeasibilityRestorationProblem` assembles.

    FR constraint rows are ordered [base eq rows; base ineq rows]; triplet
    values reuse the base formulation's scaled split evaluation, which is
    also what :meth:`eval_cons` (inherited) returns.
    """

    def __init__(self, base_form, x_ref, mu: float, nrmInf_feas_ref: float):
        super().__init__(base_form, x_ref, mu, nrmInf_feas_ref)
        b = base_form
        nx, me, mi = self.n_x, self.m_eq, self.m_ineq
        # base triplets in the split (eq-first) order produced by
        # NlpSparse.eval_jac_vals_split
        base_rows = np.concatenate([b.jac_eq_rows, me + b.jac_in_rows])
        base_cols = np.concatenate([b.jac_eq_cols, b.jac_in_cols])
        pn_rows = np.concatenate(
            [np.arange(me), np.arange(me), me + np.arange(mi), me + np.arange(mi)]
        )
        pn_cols = nx + np.concatenate(
            [
                np.arange(me),                 # p_e
                me + np.arange(me),            # n_e
                2 * me + np.arange(mi),        # p_i
                2 * me + mi + np.arange(mi),   # n_i
            ]
        )
        self._fr_jr = np.concatenate([base_rows, pn_rows]).astype(np.int64)
        self._fr_jc = np.concatenate([base_cols, pn_cols]).astype(np.int64)
        self._pn_vals = np.concatenate(
            [-np.ones(me), np.ones(me), -np.ones(mi), np.ones(mi)]
        )
        # Hessian upper triangle: base triplets + the x-diagonal proximal
        # term (duplicates with existing diagonal entries scatter-add)
        self._fr_hr = np.concatenate([b.hess_rows, np.arange(nx)]).astype(np.int64)
        self._fr_hc = np.concatenate([b.hess_cols, np.arange(nx)]).astype(np.int64)

    # -- SparseProblem structure surface ------------------------------------
    def get_sparse_blocks_info(self):
        return self.n, self._fr_jr.size, self._fr_hr.size

    def jac_structure(self):
        return self._fr_jr, self._fr_jc

    def eval_jac_vals(self, z):
        x, *_ = self._split(z)
        vals_eq, vals_in = self.base.eval_jac_vals_split(x)
        pn = jnp.asarray(self._pn_vals, z.dtype)
        return jnp.concatenate([vals_eq, vals_in, pn])

    def hess_structure(self):
        return self._fr_hr, self._fr_hc

    def eval_hess_vals(self, z, obj_factor, lam):
        x, *_ = self._split(z)
        yc = lam[: self.m_eq]
        yd = lam[self.m_eq:]
        base_vals = self.base.eval_hess_vals(x, 0.0, yc, yd)
        diag = obj_factor * self.zeta * self.DR * self.DR
        return jnp.concatenate([base_vals, jnp.asarray(diag, z.dtype)])


class MdsFeasibilityRestorationProblem(FeasibilityRestorationProblem):
    """MDS-structured FR NLP (hiopFRProbMDS, hiopFRProb.hpp:238).

    The relaxation variables p/n join the SPARSE block — they enter the
    constraints as ±identity triplet entries and the Hessian not at all —
    so the FR variable order is z = [x_s, p_e, n_e, p_i, n_i, x_d]:
    (n_s + 2m) sparse + n_d dense variables.  The nested IPM then routes
    through the MDS KKT strategies (triplet Schur elimination + dense-block
    factorization) instead of dense-assembling [J | -I | I] — at the B=512
    ACOPF shape the generic dense FR Jacobian would be (4608, 13,934).

    Constraint rows are ordered [base eq; base ineq], matching the generic
    FR classes; Jacobian/Hessian values come from the base NlpMDS
    formulation's scaled split evaluations."""

    def __init__(self, base_form, x_ref, mu: float, nrmInf_feas_ref: float):
        super().__init__(base_form, x_ref, mu, nrmInf_feas_ref)
        b = base_form
        self.ns = b.n_sparse
        self.nd = b.n_dense
        me, mi, m = self.m_eq, self.m_ineq, self.m
        ns = self.ns
        # sparse-block structure in FR row order (eq rows first), with the
        # p/n columns appended after the base sparse columns
        base_rows = np.concatenate([b.jac_sp_eq_rows, me + b.jac_sp_in_rows])
        base_cols = np.concatenate([b.jac_sp_eq_cols, b.jac_sp_in_cols])
        pn_rows = np.concatenate(
            [np.arange(me), np.arange(me), me + np.arange(mi), me + np.arange(mi)]
        )
        pn_cols = ns + np.concatenate(
            [
                np.arange(me),                 # p_e
                me + np.arange(me),            # n_e
                2 * me + np.arange(mi),        # p_i
                2 * me + mi + np.arange(mi),   # n_i
            ]
        )
        self._fr_jr = np.concatenate([base_rows, pn_rows]).astype(np.int64)
        self._fr_jc = np.concatenate([base_cols, pn_cols]).astype(np.int64)
        self._pn_vals = np.concatenate(
            [-np.ones(me), np.ones(me), -np.ones(mi), np.ones(mi)]
        )

    # -- MDS structure surface ---------------------------------------------
    def get_sparse_dense_blocks_info(self):
        return self.ns + 2 * self.m, self.nd

    def jac_sparse_structure(self):
        return self._fr_jr, self._fr_jc

    def eval_jac_blocks(self, z):
        x, *_ = self._split(z)
        (veq, vin), De, Di = self.base.eval_jac_blocks_split(x)
        pn = jnp.asarray(self._pn_vals, z.dtype)
        sp_vals = jnp.concatenate([veq, vin, pn])
        dense_blk = jnp.concatenate([De, Di], axis=0)
        return sp_vals, dense_blk

    def eval_hess_blocks(self, z, obj_factor, lam):
        x, *_ = self._split(z)
        yc = lam[: self.m_eq]
        yd = lam[self.m_eq:]
        hss, hdd = self.base.eval_hess_blocks(x, 0.0, yc, yd)
        drs = self.DR[: self.ns]
        drd = self.DR[self.ns:]
        hss_fr = jnp.concatenate(
            [
                hss + obj_factor * self.zeta * drs * drs,
                jnp.zeros((2 * self.m,), hss.dtype),
            ]
        )
        hdd_fr = hdd + obj_factor * self.zeta * jnp.diag(drd * drd)
        return hss_fr, hdd_fr

    # -- reordered generic surface ------------------------------------------
    def _split(self, z):
        ns, me, mi, nd = self.ns, self.m_eq, self.m_ineq, self.nd
        xs = z[:ns]
        pe = z[ns:ns + me]
        ne = z[ns + me:ns + 2 * me]
        pi = z[ns + 2 * me:ns + 2 * me + mi]
        ni = z[ns + 2 * me + mi:ns + 2 * me + 2 * mi]
        xd = z[ns + 2 * self.m:]
        return jnp.concatenate([xs, xd]), pe, ne, pi, ni

    def _reorder_x_pn(self, x_part, pn_part):
        """[x..., pn...] (generic order) -> [x_s, pn..., x_d] (MDS order)."""
        return np.concatenate([x_part[: self.ns], pn_part, x_part[self.ns:]])

    def get_vars_info(self):
        lo, hi = super().get_vars_info()
        return (
            self._reorder_x_pn(lo[: self.n_x], lo[self.n_x:]),
            self._reorder_x_pn(hi[: self.n_x], hi[self.n_x:]),
        )

    def get_starting_point(self):
        z = super().get_starting_point()
        return self._reorder_x_pn(z[: self.n_x], z[self.n_x:])

    def eval_grad_f(self, z):
        x, *_ = self._split(z)
        gx = self.zeta * self.DR * self.DR * (x - self.x_ref)
        rho = jnp.full((2 * self.m,), RHO, z.dtype)
        return jnp.concatenate([gx[: self.ns], rho, gx[self.ns:]])

    def eval_jac_cons(self, z):
        """Dense materialization in the MDS variable order (off-hot-path
        consumers only; the MDS KKT uses eval_jac_blocks)."""
        sp_vals, dense_blk = self.eval_jac_blocks(z)
        J = jnp.zeros((self.m, self.n), z.dtype)
        J = J.at[self._fr_jr, self._fr_jc].add(sp_vals)
        return J.at[:, self.ns + 2 * self.m:].set(dense_blk)

    def eval_hess_lagr(self, z, obj_factor, lam):
        """Dense blkdiag in the MDS variable order (off-hot-path)."""
        hss, hdd = self.eval_hess_blocks(z, obj_factor, lam)
        n_sp = self.ns + 2 * self.m
        H = jnp.zeros((self.n, self.n), z.dtype)
        H = H.at[jnp.arange(n_sp), jnp.arange(n_sp)].set(hss)
        return H.at[n_sp:, n_sp:].set(hdd)


def apply_feasibility_restoration(solver, it_curr, mu, norms):
    """Drive the nested FR solve (apply_feasibility_restoration,
    hiopAlgFilterIPM.cpp:3040+). Returns the accepted (x, d) dict or None.

    The FR subproblem keeps the base formulation's structure class: a sparse
    base routes through :class:`SparseFeasibilityRestorationProblem` +
    ``NlpSparse`` (triplet KKT, hiopFRProbSparse parity); everything else
    uses the dense-constraints FR formulation."""
    from hiop_tpu.formulation.dense import NlpDenseConstraints
    from hiop_tpu.formulation.mds import NlpMDS
    from hiop_tpu.formulation.sparse import NlpSparse
    from hiop_tpu.utils.options import NlpOptions
    import hiop_tpu.optimization.filter_ipm as fi

    base = solver.nlp
    nrm_feas = float(norms.nlp_feasib)
    base_is_sparse = isinstance(base, NlpSparse)
    base_is_mds = isinstance(base, NlpMDS)
    if base_is_sparse:
        fr_cls = SparseFeasibilityRestorationProblem
    elif base_is_mds:
        fr_cls = MdsFeasibilityRestorationProblem
    else:
        fr_cls = FeasibilityRestorationProblem
    fr_prob = fr_cls(base, it_curr.x, mu, nrm_feas)
    fr_prob.orig_filter = solver.filter

    o = NlpOptions()
    # inherit key tolerances from the base solve; quiet nested output
    o.update(
        mu0=max(fr_prob.mu_fr, 1e-6),
        tolerance=base.options.num("tolerance"),
        max_iter=min(base.options.integer("max_iter"), 500),
        verbosity_level=0,
        scaling_type="none",
        force_resto="no",
    )
    fr_file = base.options.str_("options_file_fr_prob")
    import os

    if fr_file and os.path.exists(fr_file):
        o.load_from_file(fr_file)

    newton = hasattr(base, "eval_hess") and base.options.str_("Hessian") == "analytical_exact"
    if newton:
        o.update(Hessian="analytical_exact")
    if base_is_sparse:
        nlp_fr = NlpSparse(fr_prob, o, logger=base.log)
    elif base_is_mds:
        nlp_fr = NlpMDS(fr_prob, o, logger=base.log)
    else:
        nlp_fr = NlpDenseConstraints(fr_prob, o, logger=base.log)
    alg = fi.FilterIPMNewton(nlp_fr) if newton else fi.FilterIPMQuasiNewton(nlp_fr)
    alg.within_fr = True
    result = alg.run()
    if fr_prob.accepted is not None:
        solver.log.printf(
            Verbosity.SUMMARY,
            "FR phase succeeded after %d nested iterations (theta %.3e)",
            result.iterations,
            fr_prob.accepted["theta"],
        )
        return fr_prob.accepted
    solver.log.printf(
        Verbosity.WARNING,
        "FR phase did not restore feasibility (status %s)",
        result.status.name,
    )
    if result.status.is_success:
        # the FR NLP converged to a local minimizer of the infeasibility
        # that is still infeasible -> the problem is (locally) infeasible
        solver.solver_status = SolveStatus_Infeasible()
    return None


def SolveStatus_Infeasible():
    from hiop_tpu.status import SolveStatus

    return SolveStatus.Infeasible_Problem
