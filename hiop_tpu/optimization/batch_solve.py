"""Batched NLP solves: vmap the fused whole-solve over a scenario axis.

A capability with no reference equivalent: the reference's multi-instance
driver (/root/reference/src/Drivers/MDS/hpc_multisolves.cpp) runs one CPU
solve at a time per MPI rank, and its PriDec workers
(hiopAlgPrimalDecomp.cpp:1017+) each solve one recourse NLP per message.
On TPU, a *family* of same-shape NLPs — PriDec recourse subproblems,
contingency screening, parameter sweeps — is one ``jax.vmap`` over the
``jit_mode=solve`` program (fused_newton.build_fused_solve): every IPM
iteration of every scenario advances in lockstep on the MXU, one dispatch
for the whole batch. Combined with a sharded scenario axis this scales
across a pod slice with zero communication (scenarios are independent).

The family is described by a :class:`ParametricDenseNlp`: jax-traceable
``f(x, th)`` and ``c(x, th)`` with a per-scenario parameter pytree ``th``;
bounds and the constraint eq/ineq structure are fixed across the family
(shapes must match — XLA requires a single static program).

Completed scenarios idle inside the while_loop until the whole batch
converges (lax semantics), so batching is most efficient for families with
similar iteration counts — exactly the PriDec recourse case.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hiop_tpu.formulation.dense import NlpDenseConstraints
from hiop_tpu.formulation.mds import NlpMDS
from hiop_tpu.interface.base import AutoDiffNlpProblem
from hiop_tpu.optimization import duals_update as du
from hiop_tpu.optimization import fused_newton as fn
from hiop_tpu.optimization import iterate as it_mod
from hiop_tpu.optimization.filter_ipm import FilterIPMBase
from hiop_tpu.optimization.iterate import Iterate
from hiop_tpu.status import SolveStatus
from hiop_tpu.utils.options import NlpOptions


class ParametricDenseNlp(NlpDenseConstraints):
    """A family of dense-constrained NLPs indexed by a parameter pytree.

    ``f(x, th) -> scalar`` and ``c(x, th) -> (m,)`` must be jax-traceable;
    derivatives come from autodiff. ``th0`` is a representative parameter
    used only to size/validate the family. Bounds, the eq/ineq split of the
    constraints, and the starting point rule are shared by all members.
    Problem scaling is disabled (a scale factor would couple the scenarios).
    """

    parametric = True

    def __init__(
        self,
        f: Callable,
        c: Callable,
        xl,
        xu,
        cl,
        cu,
        x0,
        th0,
        options: Optional[NlpOptions] = None,
        x0_of_th: Optional[Callable] = None,
    ):
        self._f_p = f
        self._c_p = c
        self._x0_of_th = x0_of_th
        prob = AutoDiffNlpProblem(
            f=lambda x: f(x, th0),
            c=lambda x: c(x, th0),
            xl=xl, xu=xu, cl=cl, cu=cu, x0=x0,
        )
        o = options if options is not None else NlpOptions()
        o.set("scaling_type", "none", mark_user=False)
        super().__init__(prob, o)
        self.finalize_initialization()
        eq = jnp.asarray(self.eq_idx)
        ineq = jnp.asarray(self.ineq_idx)

        def c_eq_ineq(x, th):
            c_all = c(x, th)
            return c_all[eq], c_all[ineq]

        self._c_split = c_eq_ineq
        self._grad_f = jax.grad(f, argnums=0)

        def lagr(x, th, obj_factor, yc, yd):
            ce, ci = c_eq_ineq(x, th)
            return obj_factor * f(x, th) + jnp.dot(yc, ce) + jnp.dot(yd, ci)

        self._hess_lagr = jax.hessian(lagr, argnums=0)
        self._jac_all = jax.jacfwd(c, argnums=0)

    # -- parametric eval hooks (signature: +th) -----------------------------
    def eval_f(self, x, th):
        return jnp.asarray(self._f_p(x, th))

    def eval_grad_f(self, x, th):
        return self._grad_f(x, th)

    def eval_cons(self, x, th):
        return self._c_split(x, th)

    def eval_jac(self, x, th):
        J = self._jac_all(x, th)
        return J[jnp.asarray(self.eq_idx), :], J[jnp.asarray(self.ineq_idx), :]

    def eval_hess(self, x, obj_factor, yc, yd, th):
        return self._hess_lagr(x, th, obj_factor, yc, yd)

    def starting_point(self, th):
        if self._x0_of_th is not None:
            return jnp.asarray(self._x0_of_th(th))
        return jnp.asarray(
            np.asarray(self.problem.get_starting_point(), np.float64)
        )


class _BoundThMds:
    """Adapter binding a parametric MDS template to th0 for the
    (non-parametric) formulation finalization calls."""

    jittable = True

    def __init__(self, p, th0):
        self._pp, self._th0 = p, th0

    def __getattr__(self, k):
        return getattr(self._pp, k)

    def eval_f(self, z):
        return self._pp.eval_f(z, self._th0)

    def eval_grad_f(self, z):
        return self._pp.eval_grad_f(z, self._th0)

    def eval_cons(self, z):
        return self._pp.eval_cons(z, self._th0)

    def eval_jac_blocks(self, z):
        return self._pp.eval_jac_blocks(z, self._th0)

    def eval_hess_blocks(self, z, obj_factor, lam):
        return self._pp.eval_hess_blocks(z, obj_factor, lam, self._th0)


class ParametricMdsNlp(NlpMDS):
    """A family of mixed dense-sparse NLPs indexed by a parameter pytree.

    The template ``problem`` is an :class:`~hiop_tpu.interface.base.MdsProblem`
    whose evaluation hooks take a trailing scenario parameter:
    ``eval_f(z, th)``, ``eval_grad_f(z, th)``, ``eval_cons(z, th)``,
    ``eval_jac_blocks(z, th)``, ``eval_hess_blocks(z, obj_factor, lam, th)``.
    Sizes, bounds, the sparse-block structure, and the starting-point rule
    are shared by all members (one static XLA program); ``th0`` is a
    representative parameter used for finalization. Scaling is disabled
    (a scale factor would couple the scenarios).

    The batched solve runs the MDS fused whole-solve (diag-sparse
    elimination + dense Cholesky + Schur Cholesky with the on-device
    regularization ladder) vmapped over the family — the reference's
    one-CPU-solve-per-worker pattern (hpc_multisolves.cpp, PriDec workers)
    as a single device program.
    """

    parametric = True

    def __init__(self, problem, th0, options: Optional[NlpOptions] = None,
                 x0_of_th: Optional[Callable] = None):
        self._p = problem
        self._x0_of_th = x0_of_th
        o = options if options is not None else NlpOptions()
        o.set("scaling_type", "none", mark_user=False)
        super().__init__(_BoundThMds(problem, th0), o)
        self.finalize_initialization()
        self._eq_j = jnp.asarray(self.eq_idx)
        self._in_j = jnp.asarray(self.ineq_idx)

    # -- parametric eval hooks (signature: +th) -----------------------------
    def eval_f(self, x, th):
        return jnp.asarray(self._p.eval_f(x, th))

    def eval_grad_f(self, x, th):
        return self._p.eval_grad_f(x, th)

    def eval_cons(self, x, th):
        c_all = self._p.eval_cons(x, th)
        return c_all[self._eq_j], c_all[self._in_j]

    def eval_jac(self, x, th):
        sp_vals, dense_blk = self._p.eval_jac_blocks(x, th)
        sp_vals = jnp.asarray(sp_vals)
        dense_blk = jnp.asarray(dense_blk)
        Jc = jnp.zeros((self.m_eq, self.n), x.dtype)
        Jd = jnp.zeros((self.m_ineq, self.n), x.dtype)
        if self.m_eq:
            Jc = Jc.at[self.jac_sp_eq_rows, self.jac_sp_eq_cols].add(
                sp_vals[self._jac_is_eq]
            )
            Jc = Jc.at[:, self.n_sparse:].set(dense_blk[self.eq_idx, :])
        if self.m_ineq:
            Jd = Jd.at[self.jac_sp_in_rows, self.jac_sp_in_cols].add(
                sp_vals[~self._jac_is_eq]
            )
            Jd = Jd.at[:, self.n_sparse:].set(dense_blk[self.ineq_idx, :])
        return Jc, Jd

    def eval_hess_blocks(self, x, obj_factor, yc, yd, th=None):
        if th is None:
            return super().eval_hess_blocks(x, obj_factor, yc, yd)
        lam = jnp.zeros((self.m,), x.dtype)
        if self.m_eq:
            lam = lam.at[self.eq_idx].set(yc)
        if self.m_ineq:
            lam = lam.at[self.ineq_idx].set(yd)
        hss, hdd = self._p.eval_hess_blocks(x, obj_factor, lam, th)
        return jnp.asarray(hss), jnp.asarray(hdd)

    def starting_point(self, th):
        if self._x0_of_th is not None:
            return jnp.asarray(self._x0_of_th(th))
        return jnp.asarray(
            np.asarray(self.problem.get_starting_point(), np.float64)
        )


class BatchResult(NamedTuple):
    """Per-scenario results; leading axis is the scenario axis."""

    status: np.ndarray      # SolveStatus codes as produced by the fused solve
    x: jax.Array            # (S, n)
    obj: np.ndarray         # (S,)
    iterations: np.ndarray  # (S,)
    err_nlp: np.ndarray     # (S,)
    yc: jax.Array
    yd: jax.Array


_STATUS_MAP = {
    1: SolveStatus.Solve_Success,
    2: SolveStatus.Solve_Success_RelTol,
    3: SolveStatus.Solve_Acceptable_Level,
    4: SolveStatus.Max_Iter_Exceeded,
    5: SolveStatus.Iterates_Diverging,
    6: SolveStatus.Err_Step_Computation,   # needs-host: regularization
    7: SolveStatus.Steplength_Too_Small,   # needs-host: SOC/FR
}


def build_batched_solve(pnlp):
    """Returns ``batched(params) -> (state, mu, it_num, status, err, hist)``
    with a leading scenario axis on every output: a single jitted XLA
    program solving the whole family. ``params`` is a pytree whose leaves
    have a leading scenario axis. ``pnlp`` is a :class:`ParametricDenseNlp`
    or :class:`ParametricMdsNlp` (the fused step picks the dense or MDS
    KKT reduction by formulation type)."""
    o = pnlp.options
    kappa1, kappa2 = o.num("kappa1"), o.num("kappa2")
    lsq_init = o.str_("duals_init") == "lsq"
    b = pnlp.bounds
    crhs = pnlp.crhs
    n, m_eq, m_ineq = pnlp.n, pnlp.m_eq, pnlp.m_ineq
    a = FilterIPMBase  # Wächter–Biegler constants (class attributes)
    consts = dict(
        kappa_d=a.kappa_d, kappa_Sigma=a.kappa_Sigma,
        gamma_theta=a.gamma_theta, gamma_phi=a.gamma_phi,
        s_theta=a.s_theta, s_phi=a.s_phi, delta=a.delta,
        eta_phi=o.num("eta_phi"), min_step_size=o.num("min_step_size"),
        smax=o.num("smax"),
        max_soc_iter=o.integer("max_soc_iter"), kappa_soc=o.num("kappa_soc"),
        fused_ldl=o.str_("linear_solver_dense") == "ldl_nopiv",
    )
    term = dict(
        eps_tol=o.num("tolerance"), rel_tol=o.num("rel_tolerance"),
        accep_tol=o.num("acceptable_tolerance"),
        accep_iters=o.integer("acceptable_iterations"),
        max_iter=o.integer("max_iter"), kappa_eps=o.num("kappa_eps"),
        kappa_mu=o.num("kappa_mu"), theta_mu=o.num("theta_mu"),
        tau_min=o.num("tau_min"), comp_tol_scaled=o.num("comp_tol"),
    )
    mu0 = o.num("mu0")
    tau0 = max(o.num("tau_min"), 1.0 - mu0)
    theta_max_fact = o.num("theta_max_fact")
    theta_min_fact = o.num("theta_min_fact")
    solve = fn.build_fused_solve(pnlp, consts, term, mode="newton")

    def init(th):
        """Pure-jax mirror of FilterIPMBase._fused_init for one scenario."""
        x_user = pnlp.starting_point(th)
        _f0, _c0, d0_eval = (
            pnlp.eval_f(x_user, th),
            *pnlp.eval_cons(x_user, th),
        )
        x0, d0 = it_mod.starting_point_primal(x_user, d0_eval, b, kappa1, kappa2)
        f, c, d_eval = pnlp.eval_f(x0, th), *pnlp.eval_cons(x0, th)
        dt = x0.dtype
        it = Iterate(
            x=x0, d=d0,
            sxl=jnp.ones((n,), dt), sxu=jnp.ones((n,), dt),
            sdl=jnp.ones((m_ineq,), dt), sdu=jnp.ones((m_ineq,), dt),
            yc=jnp.zeros((m_eq,), dt), yd=jnp.zeros((m_ineq,), dt),
            zl=b.ixl * 1.0, zu=b.ixu * 1.0, vl=b.idl * 1.0, vu=b.idu * 1.0,
        )
        it = it_mod.determine_slacks(it, b)
        grad = pnlp.eval_grad_f(x0, th)
        Jc, Jd = pnlp.eval_jac(x0, th)
        if lsq_init and (m_eq or m_ineq):
            # LSQ duals with the duals_lsq_ini_max cap, branch-free
            yc, yd = du.lsq_duals(Jc, Jd, grad, it.zl, it.zu, it.vl, it.vu)
            ynrm = jnp.maximum(
                jnp.max(jnp.abs(yc)) if m_eq else jnp.asarray(0.0, dt),
                jnp.max(jnp.abs(yd)) if m_ineq else jnp.asarray(0.0, dt),
            )
            keep = ynrm <= o.num("duals_lsq_ini_max")
            it = it._replace(
                yc=jnp.where(keep, yc, jnp.zeros_like(yc)),
                yd=jnp.where(keep, yd, jnp.zeros_like(yd)),
            )
        theta0 = jnp.sum(jnp.abs(crhs - c)) + jnp.sum(jnp.abs(it.d - d_eval))
        theta_ref = jnp.maximum(1.0, theta0)
        state = fn.FusedState(
            it=it, f=jnp.asarray(f), c=c, d=d_eval, grad=grad, Jc=Jc, Jd=Jd
        )
        return (th, state), theta_min_fact * theta_ref, theta_max_fact * theta_ref

    def one(th):
        state0, theta_min, theta_max = init(th)
        return solve(
            state0, mu0, tau0, theta_min, theta_max, term["max_iter"]
        )[:6]

    return jax.jit(jax.vmap(one))


def solve_batched(pnlp, params) -> BatchResult:
    """Solve every scenario of the family in ONE XLA program and return
    per-scenario results. ``params``: pytree with a leading scenario axis."""
    batched = getattr(pnlp, "_batched_solve_cache", None)
    if batched is None:
        batched = build_batched_solve(pnlp)
        pnlp._batched_solve_cache = batched
    state, mu, it_num, st, err, _hist = batched(params)
    _th, core = state
    st = np.asarray(st)
    return BatchResult(
        status=np.asarray(
            [_STATUS_MAP.get(int(s), SolveStatus.Unknown) for s in st],
            dtype=object,
        ),
        x=core.it.x,
        obj=np.asarray(core.f),
        iterations=np.asarray(it_num),
        err_nlp=np.asarray(err),
        yc=core.it.yc,
        yd=core.it.yd,
    )
