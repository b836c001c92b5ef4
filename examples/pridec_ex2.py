"""PriDec example 2 — two-stage program with NLP recourse solves
(reference /root/reference/src/Drivers/PriDec/NlpPriDecEx2Sparse.*,
NlpPriDecEx2UserBasecase.hpp, NlpPriDecEx2UserRecourseSparse.hpp):

  basecase: the SparseEx1 NLP (n = nx, scal = 1)
  recourse: r_i(x) = min_y 0.5 ||y - x||^2  s.t.
              (1 - y_1 + xi_1)^2 + sum_{k=2..nS} (y_k + xi_k)^2
                                 + sum_{k>nS} y_k^2 >= 1
              y_k - y_{k-1} >= 0 (k = 2..ny),  y_1 >= 0
            with xi = 1 (reference sets the samples to 1.0), ny = nx
  grad r_i = x - y*   (envelope theorem; eval_grad_rterm)

Each scenario is itself an interior-point solve — the reference's
"contingency solves" pattern (each worker runs a HiOp solve per scenario,
SURVEY.md §2.10). Self-check (NlpPriDecEx2SparseDriver.cpp:173): nx=20,
S=5 -> master objective 0.2633379371706 (abs tol 1e-5)."""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    NlpDenseConstraints,
    NlpOptions,
    PriDecOptions,
    PriDecProblem,
    PriDecSolver,
)
from hiop_tpu.interface.base import INF

SELFCHECK_OBJ = 0.2633379371706  # nx=20, S=5, abs tol 1e-5


def _basecase_f(x, evaluator=None):
    f = 0.25 * jnp.sum((x - 1.0) ** 4)
    if evaluator is not None:
        f = f + evaluator.eval_f(x)
    return f


def _basecase_cons(x):
    n = x.shape[0]
    head = jnp.array([4 * x[0] + 2 * x[1], 2 * x[0] + x[2]])
    tail = 2 * x[0] + 0.5 * x[3:]
    return jnp.concatenate([head, tail])


class PriDecEx2(PriDecProblem):
    batched = False  # scenarios are NLP solves; host loop

    def __init__(self, nx: int = 20, nS: int = 5, S: int = 5):
        self.nx = nx
        self.ny = nx
        self.nS = nS
        self.S = S
        self.xi = np.ones(nS)

    def get_num_rterms(self):
        return self.S

    def get_num_vars(self):
        return self.nx

    # ---- master (basecase + quadratic recourse model) ---------------------
    def solve_master(self, x, include_r, evaluator=None):
        n = self.nx
        xl = 0.5 * np.ones(n)
        xu = INF * np.ones(n)
        xl[0] = -INF
        xl[1] = 0.0
        xl[2], xu[2] = 1.5, 10.0
        cl = np.concatenate([[10.0, 5.0], np.full(max(n - 3, 0), 1.0)])
        cu = np.concatenate([[10.0, INF], np.full(max(n - 3, 0), 2.0 * n)])
        ev = evaluator if include_r else None
        p = AutoDiffNlpProblem(
            f=lambda z: _basecase_f(z, ev),
            c=_basecase_cons,
            xl=xl, xu=xu, cl=cl, cu=cu, x0=np.asarray(x),
        )
        o = NlpOptions()
        o.update(Hessian="analytical_exact", verbosity_level=0)
        r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
        return r.x, r.obj

    # ---- recourse NLP per scenario ----------------------------------------
    def _solve_recourse(self, x):
        ny, nS = self.ny, self.nS
        xj = jnp.asarray(x)
        xi = jnp.asarray(self.xi)

        def ball(y):
            t1 = (1.0 - y[0] + xi[0]) ** 2
            t2 = jnp.sum((y[1:nS] + xi[1:]) ** 2)
            t3 = jnp.sum(y[nS:] ** 2)
            return (t1 + t2 + t3)[None]

        def cons(y):
            return jnp.concatenate([ball(y), y[1:] - y[:-1]])

        xl = np.full(ny, -INF)
        xl[0] = 0.0
        cl = np.concatenate([[1.0], np.zeros(ny - 1)])
        cu = np.full(ny, INF)
        p = AutoDiffNlpProblem(
            f=lambda y: 0.5 * jnp.sum((y - xj) ** 2),
            c=cons,
            xl=xl, xu=np.full(ny, INF), cl=cl, cu=cu,
            x0=np.maximum(np.asarray(x), 0.0),
        )
        o = NlpOptions()
        o.update(Hessian="analytical_exact", verbosity_level=0, tolerance=1e-10)
        r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
        return r

    def eval_f_rterm(self, idx, x):
        return self._solve_recourse(x).obj

    def eval_grad_rterm(self, idx, x):
        y_star = self._solve_recourse(x).x
        return np.asarray(x) - y_star


class PriDecEx2Batched(PriDecEx2):
    """Ex2 with the recourse NLP solves BATCHED: all S scenario interior-
    point solves advance in lockstep as ONE vmapped ``jit_mode=solve`` XLA
    program (hiop_tpu.optimization.batch_solve) — the TPU answer to the
    reference's one-CPU-solve-per-MPI-worker contingency pattern
    (hiopAlgPrimalDecomp.cpp:1017+). Supports per-scenario samples ``xis``
    of shape (S, nS) (the reference fixes xi = 1 for every scenario)."""

    batched = True

    def __init__(self, nx: int = 20, nS: int = 5, S: int = 5, xis=None):
        super().__init__(nx, nS, S)
        self.xis = (
            np.tile(self.xi, (S, 1)) if xis is None else np.asarray(xis, np.float64)
        )
        assert self.xis.shape == (S, nS)
        from hiop_tpu.optimization.batch_solve import ParametricDenseNlp

        ny = self.ny

        def f(y, th):
            x, _xi = th
            return 0.5 * jnp.sum((y - x) ** 2)

        def c(y, th):
            _x, xi = th
            t1 = (1.0 - y[0] + xi[0]) ** 2
            t2 = jnp.sum((y[1:nS] + xi[1:]) ** 2)
            t3 = jnp.sum(y[nS:] ** 2)
            ball = (t1 + t2 + t3)[None]
            return jnp.concatenate([ball, y[1:] - y[:-1]])

        xl = np.full(ny, -INF)
        xl[0] = 0.0
        cl = np.concatenate([[1.0], np.zeros(ny - 1)])
        o = NlpOptions()
        o.update(Hessian="analytical_exact", verbosity_level=0, tolerance=1e-10)
        self._pnlp = ParametricDenseNlp(
            f, c,
            xl=xl, xu=np.full(ny, INF), cl=cl, cu=np.full(ny, INF),
            x0=np.zeros(ny),
            th0=(np.zeros(self.nx), self.xis[0]),
            options=o,
            x0_of_th=lambda th: jnp.maximum(th[0], 0.0),
        )

    def eval_rterms_batched(self, idxs, x):
        from hiop_tpu.optimization.batch_solve import solve_batched

        idxs = np.asarray(idxs)
        k = idxs.size
        xj = jnp.asarray(np.asarray(x, np.float64))
        th = (
            jnp.broadcast_to(xj, (k, self.nx)),
            jnp.asarray(self.xis)[jnp.asarray(idxs)],
        )
        res = solve_batched(self._pnlp, th)
        grads = xj[None, :] - res.x  # envelope theorem, as eval_grad_rterm
        return jnp.asarray(res.obj), grads


def solve(nx: int = 20, nS: int = 5, S: int = 5, batched: bool = False, **opts):
    o = PriDecOptions()
    o.update(**opts)
    cls = PriDecEx2Batched if batched else PriDecEx2
    return PriDecSolver(cls(nx, nS, S), o)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    nx = int(pos[0]) if pos else 20
    S = int(pos[1]) if len(pos) > 1 else 5
    solver = solve(nx, 5, S, batched="-batched" in argv)
    r = solver.run()
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if "-selfcheck" in argv:
        if abs(r.obj - SELFCHECK_OBJ) > 1e-5:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {SELFCHECK_OBJ}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
