"""Dense-constrained example 1 — infinite-dimensional QP on x:[0,1]->R.

Re-implementation of the reference driver problem
(/root/reference/src/Drivers/Dense/NlpDenseConsEx1.hpp:22-38):

  min   <c,x> + 1/2 <x,x>          (L2 inner products on a 1-D mesh)
  s.t.  integral(x) = 0.5
        0.1 <= x(t) <= 1.0
  c(t) = 1 - 10 t  for t in [0, 0.1], 0 otherwise.

Discretized on a (possibly distorted) mesh of n elements with mass
m_k = (m1 + k*h), m1 = 2r/((1+r)n), h = 2(1-r)/((1+r)n(n-1)) — the
reference's "distorted meshing" with smallest/largest element ratio r.

Self-check objectives (NlpDenseConsEx1Driver.cpp:139-140):
  n=500: 8.6156700e-2, n=5000: 8.6156106e-2, n=50000: 8.6161001e-2.
"""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):  # running as a script: make the repo importable
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import DenseConstraintsProblem, FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

SELFCHECK = {500: (8.6156700e-2, 1e-6), 5000: (8.6156106e-02, 1e-6), 50000: (8.6161001e-02, 1e-6)}


class DenseConsEx1(DenseConstraintsProblem):
    jittable = True
    jac_constant = True  # all constraints are linear (hiopLinear)

    def __init__(self, n: int = 1000, ratio: float = 1.0):
        self.n = n
        m1 = 2 * ratio / ((1 + ratio) * n)
        h = 0.0 if n == 1 else 2 * (1 - ratio) / (1 + ratio) / (n - 1) / n
        k = np.arange(n)
        self.mass = jnp.asarray(m1 + k * h)
        # function argument: midpoint of element k (reference
        # Ex1Meshing1D::getFunctionArgument: t = ((2k+1) m1 + k^2 h)/2);
        # NOTE the reference's actual c is the *negative* ramp
        # (NlpDenseConsEx1.cpp set_c: cval = -1 + 10 t for t <= 0.1).
        t = 0.5 * ((2 * k + 1) * m1 + k * k * h)
        c = np.where(t <= 0.1, -1.0 + 10.0 * t, 0.0)
        self.c = jnp.asarray(c)

    def get_prob_sizes(self):
        return self.n, 1

    def get_vars_info(self):
        return 0.1 * np.ones(self.n), 1.0 * np.ones(self.n)

    def get_cons_info(self):
        return np.array([0.5]), np.array([0.5])

    def get_starting_point(self):
        return 0.5 * np.ones(self.n)

    def eval_f(self, x):
        return jnp.sum(self.mass * self.c * x) + 0.5 * jnp.sum(self.mass * x * x)

    def eval_grad_f(self, x):
        return self.mass * (x + self.c)

    def eval_cons(self, x):
        return jnp.sum(self.mass * x)[None]

    def eval_jac_cons(self, x):
        return self.mass[None, :]


def solve(n: int = 1000, ratio: float = 1.0, **opts):
    o = NlpOptions()
    o.update(**opts)
    nlp = NlpDenseConstraints(DenseConsEx1(n, ratio), o)
    return FilterIPMQuasiNewton(nlp).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 20000
    ratio = float(argv[1]) if len(argv) > 1 and argv[1] != "-selfcheck" else 1.0
    selfcheck = "-selfcheck" in argv
    r = solve(n, ratio)
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if selfcheck:
        if n not in SELFCHECK:
            print(f"selfcheck: no saved objective for n={n}")
            return 1
        ref, tol = SELFCHECK[n]
        if not r.status.is_success:
            print(f"selfcheck FAILED: solver status {r.status.name}")
            return 1
        if abs((ref - r.obj) / (1 + ref)) > tol:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {ref}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
