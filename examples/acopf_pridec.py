"""PriDec SC-ACOPF: two-stage security-constrained dispatch.

The reference's flagship PriDec workload (SC-ACOPF,
doc/pridec_implpaper.pdf; hiopAlgPrimalDecomposition,
hiopAlgPrimalDecomp.cpp): a master problem picks the basecase dispatch,
each scenario solves a contingency re-dispatch NLP, and the master is
re-solved against a quadratic recourse model built from the scenario
values/gradients. Where the reference dispatches one CPU IPM per MPI
worker (Isend/Irecv work-stealing, cpp:908-999), here EVERY outer
iteration evaluates all contingencies as ONE vmapped fused device program
(`batch_solve.solve_batched` over :class:`AcopfRecourseMds`, with the
on-device LDL inertia ladder).

Stage 1 (master): the basecase ACOPF (examples/acopf_mds.py) over
dispatch g, plus the PriDec quadratic recourse model on g.
Stage 2 (scenario k): the grid with line k outaged, re-dispatching at
cost rho_track/2 ||g_k - g||^2 around the master setpoint; by the
envelope theorem dr_k/dg = rho_track (g - g_k*).
"""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
from hiop_tpu.interface.pridec import PriDecProblem, RecourseApproxEvaluator
from hiop_tpu.optimization.pridec import PriDecSolver
from hiop_tpu.utils.options import PriDecOptions

from examples.acopf_mds import AcopfContingencyMds, AcopfMds

RHO_TRACK = 1.0  # re-dispatch tracking weight around the master setpoint
# (kept soft: a near-pinned dispatch makes outaged scenarios infeasible)


class AcopfRecourseMds(AcopfContingencyMds):
    """Contingency re-dispatch NLP: the outaged-grid ACOPF plus
    rho_track/2 ||g - g_ref||^2, parameterized by
    th = {gv, bv, gref} (admittances + master dispatch)."""

    def th0(self):
        base = super().th0()
        base["gref"] = jnp.asarray(self.core.start_dense())
        return base

    def eval_f(self, x, th):
        z, g = self._split(x)
        return (
            self.core.obj_sparse(z)
            + self.core.obj_dense(g)
            + 0.5 * RHO_TRACK * jnp.sum((g - th["gref"]) ** 2)
        )

    def eval_grad_f(self, x, th):
        z, g = self._split(x)
        return jnp.concatenate([
            self.core.grad_sparse(z),
            self.core.grad_dense(g) + RHO_TRACK * (g - th["gref"]),
        ])

    def eval_hess_blocks(self, x, obj_factor, lam, th):
        hss, hdd = super().eval_hess_blocks(x, obj_factor, lam, th)
        ng = self.nd
        return hss, hdd + obj_factor * RHO_TRACK * jnp.eye(ng, dtype=hdd.dtype)


class _MasterAcopf(AcopfMds):
    """Basecase ACOPF with the PriDec recourse model appended on the
    dense dispatch block (the role of the reference's
    set_recourse_approx_evaluator + include_r master solves)."""

    def __init__(self, n_bus, seed, evaluator=None):
        super().__init__(n_bus, seed)
        self._ev = evaluator

    def eval_f(self, x):
        f = super().eval_f(x)
        if self._ev is not None:
            g = x[self.n_sp:]
            dg = g - jnp.asarray(self._ev.x0)
            f = f + (
                self._ev.rval
                + jnp.asarray(self._ev.grad) @ dg
                + 0.5 * jnp.sum(jnp.asarray(self._ev.hess_diag) * dg * dg)
            )
        return f

    def eval_grad_f(self, x):
        gr = super().eval_grad_f(x)
        if self._ev is not None:
            g = x[self.n_sp:]
            dg = g - jnp.asarray(self._ev.x0)
            add = jnp.asarray(self._ev.grad) + jnp.asarray(self._ev.hess_diag) * dg
            gr = gr.at[self.n_sp:].add(add)
        return gr

    def eval_hess_blocks(self, x, obj_factor, lam):
        hss, hdd = super().eval_hess_blocks(x, obj_factor, lam)
        if self._ev is not None:
            hdd = hdd + obj_factor * jnp.diag(jnp.asarray(self._ev.hess_diag))
        return hss, hdd


class AcopfPriDec(PriDecProblem):
    """Two-stage SC-ACOPF through the PriDec interface: coupled variables
    are the ng dispatch setpoints; recourse terms are the N-1 line-outage
    re-dispatch problems, evaluated batched."""

    batched = True

    def __init__(self, n_bus: int = 16, n_cont: int = 4, seed: int = 0):
        self.n_bus = n_bus
        self.seed = seed
        self.rec = AcopfRecourseMds(n_bus, seed)
        self.ng = self.rec.nd
        n_ring = n_bus
        self.lines = [
            (i * n_ring) // max(n_cont, 1) for i in range(n_cont)
        ]
        self._th_gb = self.rec.contingency_params(self.lines)
        self._pnlp = None
        self._ev = None

    # -- PriDec interface -----------------------------------------------------
    def get_num_rterms(self) -> int:
        return len(self.lines)

    def get_num_vars(self) -> int:
        return self.ng

    def solve_master(self, x, include_r, evaluator=None, options_file=""):
        o = NlpOptions()
        o.update(Hessian="analytical_exact", fixed_var="relax",
                 tolerance=1e-6, mu0=0.1, verbosity_level=0)
        if options_file:
            try:
                o.load_from_file(options_file)
            except FileNotFoundError:
                pass
        prob = _MasterAcopf(self.n_bus, self.seed,
                            evaluator if include_r else None)
        r = FilterIPMNewton(NlpMDS(prob, o)).run()
        if not r.status.is_success:
            raise RuntimeError(f"master solve failed: {r.status.name}")
        return np.asarray(r.x[prob.n_sp:]), float(r.obj)

    def eval_rterms_batched(self, idxs, x):
        from hiop_tpu.optimization.batch_solve import ParametricMdsNlp, solve_batched

        if self._pnlp is None:
            o = NlpOptions()
            o.update(Hessian="analytical_exact", fixed_var="relax",
                     tolerance=1e-6, mu0=0.1, verbosity_level=0,
                     linear_solver_dense="ldl_nopiv")
            core = self.rec.core

            def x0_of_th(th):
                # warm-start the scenario at the master dispatch: the
                # network state starts flat, the dense block at gref
                z0 = jnp.asarray(core.start_sparse())
                return jnp.concatenate([z0, th["gref"]])

            self._pnlp = ParametricMdsNlp(
                self.rec, self.rec.th0(), o, x0_of_th=x0_of_th
            )
        idxs = np.asarray(idxs)
        gref = jnp.broadcast_to(
            jnp.asarray(np.asarray(x, np.float64)), (idxs.size, self.ng)
        )
        th = dict(
            gv=self._th_gb["gv"][jnp.asarray(idxs)],
            bv=self._th_gb["bv"][jnp.asarray(idxs)],
            gref=gref,
        )
        res = solve_batched(self._pnlp, th)
        g_opt = np.array(res.x[:, self.rec.n_sp:])
        rvals = np.array(res.obj, dtype=np.float64)
        # scenarios the fused program cannot certify (a failed factorization
        # or a rejected line search needs the host's FR/safe-mode machinery)
        # fall back to individual host solves — the reference's recourse
        # evaluations are host IPMs per MPI worker to begin with
        for i, s in enumerate(res.status):
            if s.is_success:
                continue
            ri = self._solve_recourse_host(
                dict(gv=th["gv"][i], bv=th["bv"][i], gref=th["gref"][i])
            )
            rvals[i] = ri[0]
            g_opt[i] = ri[1]
        # envelope theorem: dr_k/dg = rho_track (g - g_k*)
        grads = RHO_TRACK * (np.asarray(x, np.float64)[None, :] - g_opt)
        return jnp.asarray(rvals), jnp.asarray(grads)

    def _solve_recourse_host(self, th_k):
        from hiop_tpu.optimization.batch_solve import _BoundThMds

        o = NlpOptions()
        o.update(Hessian="analytical_exact", fixed_var="relax",
                 tolerance=1e-6, mu0=0.1, verbosity_level=0)
        prob = _BoundThMds(self.rec, th_k)
        r = FilterIPMNewton(NlpMDS(prob, o)).run()
        if not r.status.is_success:
            raise RuntimeError(f"host recourse solve failed: {r.status.name}")
        return float(r.obj), np.asarray(r.x[self.rec.n_sp:])

    def set_recourse_approx_evaluator(self, evaluator: RecourseApproxEvaluator):
        self._ev = evaluator


def solve(n_bus: int = 16, n_cont: int = 4, seed: int = 0, **opts):
    o = PriDecOptions()
    o.update(verbosity_level=1, max_iter=30, tolerance=1e-5)
    o.update(**opts)
    prob = AcopfPriDec(n_bus, n_cont, seed)
    return PriDecSolver(prob, o).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    n_bus = int(pos[0]) if pos else 16
    n_cont = int(pos[1]) if len(pos) > 1 else 4
    r = solve(n_bus, n_cont)
    print(f"PriDec SC-ACOPF: status {r.status.name} obj {r.obj:.9e} "
          f"iters {r.iterations} convergence {r.convergence:.3e}")
    if "-selfcheck" in argv:
        ok = r.status.name in ("Solve_Success", "Solve_Acceptable_Level")
        print("selfcheck OK" if ok else "selfcheck FAILED")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
