"""Sparse example 4 — tiny concave QP exercising negative curvature /
inertia correction (reference /root/reference/src/Drivers/Sparse/
NlpSparseEx4.hpp:11-19, NlpSparseEx4.cpp:80-135):

  min   scal * (-3 x^2 - 2 y^2)
  s.t.  scal * (y - 0.06 x^2) >= 0
        scal * (y + 0.05 x^2) <= 10
        scal * y^2            <= 64
        scal * x^2            <= 100
        0 <= x <= 11, 0 <= y <= 11

The objective is concave and every constraint curvature is indefinite in
the Lagrangian, so the KKT system needs primal regularization (delta_w)
at most iterates — this is the reference's smallest stress test for
hiopPDPerturbation + the inertia(-free) acceptors.

Reference quirks (documented, not reproduced):
  * NlpSparseEx4.cpp applies ``scal`` to the constraint bodies but NOT to
    their Jacobian/Hessian entries — inconsistent derivatives for
    scal != 1.  We scale consistently (the driver only uses scal=1.0).
  * The header comment says constraint 2 is ``y - 0.05 x^2`` while the
    code implements ``y + 0.05 x^2`` (NlpSparseEx4.cpp:128); we follow
    the code.
  * The driver's self_check table (NlpSparseEx4Driver.cpp:294) is
    copy-pasted from Ex1 (values keyed on n=50/500/5000 for a fixed
    2-variable problem) and does not correspond to this NLP.

True global optimum (verified with scipy SLSQP from multiple starts):
constraints 1 and 2 are simultaneously active, x* = sqrt(10/0.11),
y* = 60/11, f* = -40200/121 = -332.23140495867767.  (scal=1)
"""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import FilterIPMNewton, NlpOptions, NlpSparse, SparseProblem
from hiop_tpu.interface.base import INF

# Verified optimum (global); the reference's own table is bogus (see module doc).
SELFCHECK = {2: (-40200.0 / 121.0, 1e-6)}


class SparseEx4(SparseProblem):
    jittable = True

    def __init__(self, scal: float = 1.0):
        self.n = 2
        self.m = 4
        self.scal = scal

    def get_prob_sizes(self):
        return self.n, self.m

    def get_vars_info(self):
        return np.zeros(2), np.full(2, 11.0)

    def get_cons_info(self):
        s = self.scal
        cl = np.array([0.0, -INF, -INF, -INF])
        cu = np.array([INF, 10.0 * s, 64.0 * s, 100.0 * s])
        return cl, cu

    def get_starting_point(self):
        return np.zeros(2)

    def get_sparse_blocks_info(self):
        return self.n, 6, 2

    def jac_structure(self):
        return np.array([0, 0, 1, 1, 2, 3]), np.array([0, 1, 0, 1, 1, 0])

    def eval_jac_vals(self, x):
        s = self.scal
        return jnp.array(
            [-0.12 * s * x[0], s, 0.1 * s * x[0], s, 2.0 * s * x[1], 2.0 * s * x[0]]
        )

    def hess_structure(self):
        return np.array([0, 1]), np.array([0, 1])

    def eval_hess_vals(self, x, obj_factor, lam):
        s = self.scal
        hxx = obj_factor * (-6.0 * s) + s * (-0.12 * lam[0] + 0.1 * lam[1] + 2.0 * lam[3])
        hyy = obj_factor * (-4.0 * s) + s * (2.0 * lam[2])
        return jnp.array([hxx, hyy])

    def eval_f(self, x):
        return self.scal * (-3.0 * x[0] ** 2 - 2.0 * x[1] ** 2)

    def eval_grad_f(self, x):
        return self.scal * jnp.array([-6.0 * x[0], -4.0 * x[1]])

    def eval_cons(self, x):
        s = self.scal
        return s * jnp.array(
            [
                x[1] - 0.06 * x[0] ** 2,
                x[1] + 0.05 * x[0] ** 2,
                x[1] ** 2,
                x[0] ** 2,
            ]
        )


def solve(scal: float = 1.0, **opts):
    o = NlpOptions()
    # reference driver options (NlpSparseEx4Driver.cpp:206-215)
    defaults = dict(
        Hessian="analytical_exact",
        duals_update_type="linear",
        KKTLinsys="xdycyd",
        mu0=0.1,
    )
    defaults.update(opts)
    o.update(**defaults)
    nlp = NlpSparse(SparseEx4(scal), o)
    return FilterIPMNewton(nlp).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    opts = {}
    if "-inertiafree" in argv:
        opts["fact_acceptor"] = "inertia_free"
    if "-fr" in argv:
        opts["force_resto"] = "yes"
    r = solve(**opts)
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if "-selfcheck" in argv:
        ref, tol = SELFCHECK[2]
        if not r.status.is_success:
            print(f"selfcheck FAILED: solver status {r.status.name}")
            return 1
        if abs((ref - r.obj) / (1 + abs(ref))) > tol:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {ref}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
