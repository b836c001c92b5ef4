"""Dense-constrained example 4 — tiny concave NLP with nonlinear constraints
(reference /root/reference/src/Drivers/Dense/NlpDenseConsEx4.hpp:15-24):

  min  -3 x^2 - 2 y^2
  s.t. y - 0.06 x^2 >= 0
       y + 0.05 x^2 <= 10
       y^2 <= 64
       x^2 <= 100
       0 <= x <= 11, 0 <= y <= 11,  x0 = 0

Optimum at the parabola intersection x^2 = 1000/11, y = 60/11; saved
objective -3.32231409044575e+02 (NlpDenseConsEx4Driver.cpp:99, relerr 1e-6).
Tests the quasi-Newton solver on a nonconvex problem with curved
constraints (and the unconstrained corner case)."""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import DenseConstraintsProblem, FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
from hiop_tpu.interface.base import INF

SELFCHECK_OBJ = -3.32231409044575e02


class DenseConsEx4(DenseConstraintsProblem):
    jittable = True

    def __init__(self, unconstrained: bool = False):
        self.unconstrained = unconstrained

    def get_prob_sizes(self):
        return 2, 0 if self.unconstrained else 4

    def get_vars_info(self):
        return np.zeros(2), np.full(2, 11.0)

    def get_cons_info(self):
        if self.unconstrained:
            return np.zeros(0), np.zeros(0)
        cl = np.array([0.0, -INF, -INF, -INF])
        cu = np.array([INF, 10.0, 64.0, 100.0])
        return cl, cu

    def get_starting_point(self):
        return np.zeros(2)

    def eval_f(self, z):
        x, y = z[0], z[1]
        return -3.0 * x * x - 2.0 * y * y

    def eval_grad_f(self, z):
        return jnp.array([-6.0 * z[0], -4.0 * z[1]])

    def eval_cons(self, z):
        if self.unconstrained:
            return jnp.zeros((0,), z.dtype)
        x, y = z[0], z[1]
        return jnp.array([y - 0.06 * x * x, y + 0.05 * x * x, y * y, x * x])

    def eval_jac_cons(self, z):
        if self.unconstrained:
            return jnp.zeros((0, 2), z.dtype)
        x, y = z[0], z[1]
        return jnp.array(
            [[-0.12 * x, 1.0], [0.10 * x, 1.0], [0.0, 2.0 * y], [2.0 * x, 0.0]]
        )


def solve(unconstrained: bool = False, **opts):
    o = NlpOptions()
    # the reference driver's options (NlpDenseConsEx4Driver.cpp:64-66):
    # without the linear dual update the LSQ compromise stalls the dual
    # infeasibility just above kappa_eps*mu on this degenerate problem —
    # in this solver and in the reference alike
    o.update(duals_update_type="linear", mu0=0.1)
    o.update(**opts)
    nlp = NlpDenseConstraints(DenseConsEx4(unconstrained), o)
    return FilterIPMQuasiNewton(nlp).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    r = solve("-unconstrained" in argv)
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if "-selfcheck" in argv:
        if not r.status.is_success:
            print(f"selfcheck FAILED: solver status {r.status.name}")
            return 1
        if abs((SELFCHECK_OBJ - r.obj) / (1 + SELFCHECK_OBJ)) > 1e-6:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {SELFCHECK_OBJ}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
