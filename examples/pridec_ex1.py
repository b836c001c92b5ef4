"""PriDec example 1 — two-stage stochastic toy (reference
/root/reference/src/Drivers/PriDec/NlpPriDecEx1.hpp:7-20):

  basecase:  min sum 0.5 (x_i - 1)^2   s.t. x >= 0
  recourse:  r = 1/S sum_{i=1..S} 0.5 |x + S e_i|^2, (S e_i)_j = S if j==i<=nx
             else 0

Analytic optimum: x* = 0, total objective 0.5*S*nx + 0.5*nx
(NlpPriDecEx1Driver.cpp:169, selfcheck tol 1e-5).

The master problem is solved with the Newton IPM on an autodiff problem;
the scenario batch is evaluated with one vmapped call (the TPU-native
replacement for the reference's MPI dynamic scheduling)."""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
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


class PriDecEx1(PriDecProblem):
    batched = True

    def __init__(self, nx: int = 20, S: int = 100):
        self.nx = nx
        self.S = S

        def rterm(i, x):
            shift = jnp.where(jnp.arange(self.nx) == i, float(S), 0.0)
            z = x + shift
            return 0.5 * jnp.dot(z, z)

        self._rterm_val = jax.jit(jax.vmap(rterm, in_axes=(0, None)))
        self._rterm_grad = jax.jit(jax.vmap(jax.grad(rterm, argnums=1), in_axes=(0, None)))

    def get_num_rterms(self):
        return self.S

    def get_num_vars(self):
        return self.nx

    def solve_master(self, x, include_r, evaluator=None):
        nx = self.nx

        if include_r and evaluator is not None:
            f = lambda z: 0.5 * jnp.sum((z - 1.0) ** 2) + evaluator.eval_f(z)
        else:
            f = lambda z: 0.5 * jnp.sum((z - 1.0) ** 2)
        p = AutoDiffNlpProblem(
            f=f,
            c=None,
            xl=np.zeros(nx),
            xu=np.full(nx, INF),
            cl=np.zeros(0),
            cu=np.zeros(0),
            x0=np.asarray(x),
        )
        o = NlpOptions()
        o.update(Hessian="analytical_exact", verbosity_level=0, tolerance=1e-8)
        r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
        return r.x, r.obj

    def eval_rterms_batched(self, idxs, x):
        xj = jnp.asarray(x)
        ij = jnp.asarray(idxs)
        return self._rterm_val(ij, xj), self._rterm_grad(ij, xj)

    def eval_f_rterm(self, idx, x):
        shift = np.zeros(self.nx)
        if idx < self.nx:
            shift[idx] = self.S
        z = np.asarray(x) + shift
        return 0.5 * float(z @ z)

    def eval_grad_rterm(self, idx, x):
        shift = np.zeros(self.nx)
        if idx < self.nx:
            shift[idx] = self.S
        return np.asarray(x) + shift


def solve(nx: int = 20, S: int = 100, **opts):
    o = PriDecOptions()
    o.update(**opts)
    return PriDecSolver(PriDecEx1(nx, S), o)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    nx = int(pos[0]) if pos else 20
    S = int(pos[1]) if len(pos) > 1 else 100
    solver = solve(nx, S)
    r = solver.run()
    obj_true = 0.5 * S * nx + 0.5 * nx
    print(
        f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations} "
        f"(analytic {obj_true:.6e})"
    )
    if "-selfcheck" in argv:
        if abs(r.obj - obj_true) > 1e-5:
            print(f"selfcheck FAILED: obj {r.obj} vs analytic {obj_true}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
