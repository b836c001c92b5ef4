"""Mixed dense-sparse example 1 (reference
/root/reference/src/Drivers/MDS/NlpMdsEx1.hpp:26-56):

  min  sum 0.5 x_i (x_i - 1) + 0.5 y' Qd y + 0.5 s' s
  s.t. x + s + Md y = 0                    (ns equalities)
       -2   <= x_1 + e's + e'y <= 2
       -inf <= x_2       + e'y <= 2
       -2   <= x_3       + e'y <= inf
       x <= 3;  s >= 0;  -4 <= y_1 <= 4, rest of y free
  x0 = all ones. Sparse variables [x, s] (2*ns), dense variables y (nd).
  Qd = 1e-8 + 2*I + 1 on the (i,i+1)/(i+1,i) off-diagonals for i=1..nd-2;
  Md = -1 everywhere.

Self-check (NlpMdsEx1Driver.cpp:149): ns=400, nd=100 ->
  obj = -4.9994906229741609e+01 (abs tol 1e-6).
"""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import FilterIPMNewton, MdsProblem, NlpMDS, NlpOptions
from hiop_tpu.interface.base import INF

SELFCHECK_OBJ = -4.9994906229741609e01  # ns=400, nd=100


class MdsEx1(MdsProblem):
    jittable = True
    jac_constant = True  # all constraints are linear (hiopLinear)

    def __init__(self, ns: int = 400, nd: int = 100, empty_sp_row: bool = False):
        """empty_sp_row=True drops x_2 from the second inequality, leaving a
        constraint row with no sparse-block entries (the reference's
        -empty_sp_row corner case; row 2 body becomes e'y only)."""
        if ns % 4 != 0:
            ns = 4 * ((4 + ns) // 4)
        self.ns = ns
        self.nd = nd
        self.empty_sp_row = empty_sp_row
        self.n_sp = 2 * ns   # [x, s]
        self.m = ns + 3
        Q = np.full((nd, nd), 1e-8)
        Q += 2.0 * np.eye(nd)
        for i in range(1, nd - 1):
            Q[i, i + 1] += 1.0
            Q[i + 1, i] += 1.0
        self.Qd = jnp.asarray(Q)
        self.Md = jnp.asarray(np.full((ns, nd), -1.0))
        # sparse-block Jacobian structure over [x, s]
        rows = list(range(ns)) + list(range(ns))          # eq: x_i, s_i
        cols = list(range(ns)) + list(range(ns, 2 * ns))
        # ineq row ns: x_1 + e's ; row ns+1: x_2 (absent when empty_sp_row);
        # row ns+2: x_3
        rows += [ns] + [ns] * ns
        cols += [0] + list(range(ns, 2 * ns))
        if not empty_sp_row:
            rows += [ns + 1]
            cols += [1]
        rows += [ns + 2]
        cols += [2]
        self._jr = np.asarray(rows)
        self._jc = np.asarray(cols)
        nnz = self._jr.size
        self._jv = jnp.ones((nnz,), jnp.float64)

    # -- interface ----------------------------------------------------------
    def get_prob_sizes(self):
        return self.n_sp + self.nd, self.m

    def get_sparse_dense_blocks_info(self):
        return self.n_sp, self.nd

    def get_vars_info(self):
        ns, nd = self.ns, self.nd
        xl = np.concatenate([np.full(ns, -INF), np.zeros(ns), np.full(nd, -INF)])
        xu = np.concatenate([np.full(ns, 3.0), np.full(ns, INF), np.full(nd, INF)])
        xl[2 * ns] = -4.0
        xu[2 * ns] = 4.0
        return xl, xu

    def get_cons_info(self):
        ns = self.ns
        cl = np.concatenate([np.zeros(ns), [-2.0, -INF, -2.0]])
        cu = np.concatenate([np.zeros(ns), [2.0, 2.0, INF]])
        return cl, cu

    def get_starting_point(self):
        return np.ones(self.n_sp + self.nd)

    # -- evaluations --------------------------------------------------------
    def _split(self, z):
        ns, nd = self.ns, self.nd
        return z[:ns], z[ns:2 * ns], z[2 * ns:]

    def eval_f(self, z):
        x, s, y = self._split(z)
        return (
            0.5 * jnp.sum(x * (x - 1.0))
            + 0.5 * y @ (self.Qd @ y)
            + 0.5 * jnp.sum(s * s)
        )

    def eval_grad_f(self, z):
        x, s, y = self._split(z)
        return jnp.concatenate([x - 0.5, s, self.Qd @ y])

    def eval_cons(self, z):
        x, s, y = self._split(z)
        eq = x + s + self.Md @ y
        ey = jnp.sum(y)
        row1 = (0.0 if self.empty_sp_row else x[1]) + ey
        ineq = jnp.array([x[0] + jnp.sum(s) + ey, row1, x[2] + ey])
        return jnp.concatenate([eq, ineq])

    def jac_sparse_structure(self):
        return self._jr, self._jc

    def eval_jac_blocks(self, z):
        ns, nd = self.ns, self.nd
        dense = jnp.concatenate(
            [self.Md, jnp.ones((3, nd), jnp.float64)], axis=0
        )
        return self._jv, dense

    def eval_hess_blocks(self, z, obj_factor, lam):
        hss = obj_factor * jnp.ones((self.n_sp,), jnp.float64)
        hdd = obj_factor * self.Qd
        return hss, hdd


def solve(ns: int = 400, nd: int = 100, driver_options: bool = True, empty_sp_row: bool = False, **opts):
    """driver_options=True replicates the reference driver's settings
    (NlpMdsEx1Driver.cpp:129-140: tol 1e-5, mu0 0.1, duals_init zero) under
    which this solver reproduces HiOp's saved objective to ~6e-9; pass
    False for the solver defaults (tol 1e-8), which converge further to
    -49.99510."""
    o = NlpOptions()
    o.update(Hessian="analytical_exact", KKTLinsys="xdycyd")
    if driver_options:
        o.update(tolerance=1e-5, mu0=0.1, duals_init="zero", duals_update_type="linear")
    o.update(**opts)
    nlp = NlpMDS(MdsEx1(ns, nd, empty_sp_row), o)
    return FilterIPMNewton(nlp).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    ns = int(pos[0]) if pos else 400
    nd = int(pos[1]) if len(pos) > 1 else 100
    # -pallas: run with the Pallas kernel backend + f32 factorization
    # (mixed precision) — the role of the reference's RAJA/GPU driver
    # variant NlpMdsRajaEx1 (src/Drivers/MDS/NlpMdsRajaEx1.hpp)
    extra = (
        dict(exec_policies="pallas", kkt_fact_dtype="float32")
        if "-pallas" in argv
        else {}
    )
    r = solve(ns, nd, **extra)
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if "-selfcheck" in argv:
        if not r.status.is_success:
            print(f"selfcheck FAILED: solver status {r.status.name}")
            return 1
        if (ns, nd) != (400, 100):
            print("selfcheck: saved objective only for ns=400 nd=100")
            return 1
        if abs(r.obj - SELFCHECK_OBJ) > 1e-6:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {SELFCHECK_OBJ}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
