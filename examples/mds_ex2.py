"""Mixed dense-sparse example 2 — highly nonconvex, optionally rank-deficient
(reference /root/reference/src/Drivers/MDS/NlpMdsEx2.hpp:26-55):

  min  sgn * 0.5 sum x_i (x_i - 1) + 0.5 y' Q y + 0.5 s' s
       (sgn = -1 nonconvex default; Q = sgn*2*I + 1 on the
        (i,i+1)/(i+1,i) off-diagonals for i=1..nd-2)
  s.t. x + s + Md y = 0
       -2 <= x_1 + e's + e'y <= 2;  x_2 + e'y <= 2;  -2 <= x_3 + e'y
       -10 <= x <= 3;  s >= 0;  -4 <= y <= 4
  optional rank-deficient rows (rnkdef):
       x_1 + e's + x_2 + 2 e'y <= 4
       -4 <= x_1 + e's + x_3 + 2 e'y
       x + s + Md y = 0  (duplicate equality block)

Self-check (NlpMdsEx2Driver.cpp test 3: nonconvex, full-rank, linear duals,
mu0=0.1): ns=400, nd=100 -> obj = -3.160999998751e+03 (rel 1e-6)."""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hiop_tpu import FilterIPMNewton, MdsProblem, NlpMDS, NlpOptions
from hiop_tpu.interface.base import INF

SELFCHECK_OBJ = -3.160999998751e03  # ns=400, nd=100, test-3 config


class MdsEx2(MdsProblem):
    jittable = True
    jac_constant = True  # all constraints are linear (hiopLinear)

    def __init__(
        self,
        ns: int = 400,
        nd: int = 100,
        convex_obj: bool = False,
        rankdefic_eq: bool = False,
        rankdefic_ineq: bool = False,
    ):
        if ns % 4 != 0:
            ns = 4 * ((4 + ns) // 4)
        self.ns = ns
        self.nd = nd
        self.sgn = 2 * int(convex_obj) - 1
        self.rd_eq = rankdefic_eq
        self.rd_ineq = rankdefic_ineq
        self.n_sp = 2 * ns
        self.m = ns + 3 + 2 * int(rankdefic_ineq) + ns * int(rankdefic_eq)

        Q = np.zeros((nd, nd))
        Q += self.sgn * 2.0 * np.eye(nd)
        for i in range(1, nd - 1):
            Q[i, i + 1] += 1.0
            Q[i + 1, i] += 1.0
        self.Qd = jnp.asarray(Q)
        self.Md = jnp.asarray(np.full((ns, nd), -1.0))

        rows = list(range(ns)) + list(range(ns))
        cols = list(range(ns)) + list(range(ns, 2 * ns))
        r = ns
        rows += [r] + [r] * ns + [r + 1] + [r + 2]
        cols += [0] + list(range(ns, 2 * ns)) + [1] + [2]
        r += 3
        if rankdefic_ineq:
            rows += [r] + [r] * ns + [r]
            cols += [0] + list(range(ns, 2 * ns)) + [1]
            r += 1
            rows += [r] + [r] * ns + [r]
            cols += [0] + list(range(ns, 2 * ns)) + [2]
            r += 1
        if rankdefic_eq:
            rows += list(range(r, r + ns)) + list(range(r, r + ns))
            cols += list(range(ns)) + list(range(ns, 2 * ns))
            r += ns
        self._jr = np.asarray(rows)
        self._jc = np.asarray(cols)
        self._jv = jnp.ones((self._jr.size,), jnp.float64)

    def get_prob_sizes(self):
        return self.n_sp + self.nd, self.m

    def get_sparse_dense_blocks_info(self):
        return self.n_sp, self.nd

    def get_vars_info(self):
        ns, nd = self.ns, self.nd
        xl = np.concatenate([np.full(ns, -10.0), np.zeros(ns), np.full(nd, -4.0)])
        xu = np.concatenate([np.full(ns, 3.0), np.full(ns, INF), np.full(nd, 4.0)])
        return xl, xu

    def get_cons_info(self):
        ns = self.ns
        cl = [0.0] * ns + [-2.0, -INF, -2.0]
        cu = [0.0] * ns + [2.0, 2.0, INF]
        if self.rd_ineq:
            cl += [-INF, -4.0]
            cu += [4.0, INF]
        if self.rd_eq:
            cl += [0.0] * ns
            cu += [0.0] * ns
        return np.asarray(cl), np.asarray(cu)

    def get_starting_point(self):
        return np.ones(self.n_sp + self.nd)

    def _split(self, z):
        ns = self.ns
        return z[:ns], z[ns:2 * ns], z[2 * ns:]

    def eval_f(self, z):
        x, s, y = self._split(z)
        return (
            self.sgn * 0.5 * jnp.sum(x * (x - 1.0))
            + 0.5 * y @ (self.Qd @ y)
            + 0.5 * jnp.sum(s * s)
        )

    def eval_grad_f(self, z):
        x, s, y = self._split(z)
        return jnp.concatenate([self.sgn * (x - 0.5), s, self.Qd @ y])

    def eval_cons(self, z):
        x, s, y = self._split(z)
        eq = x + s + self.Md @ y
        ey = jnp.sum(y)
        es = jnp.sum(s)
        parts = [eq, jnp.array([x[0] + es + ey, x[1] + ey, x[2] + ey])]
        if self.rd_ineq:
            parts.append(
                jnp.array([x[0] + es + x[1] + 2 * ey, x[0] + es + x[2] + 2 * ey])
            )
        if self.rd_eq:
            parts.append(eq)
        return jnp.concatenate(parts)

    def jac_sparse_structure(self):
        return self._jr, self._jc

    def eval_jac_blocks(self, z):
        nd = self.nd
        blocks = [self.Md, jnp.ones((3, nd), jnp.float64)]
        if self.rd_ineq:
            blocks.append(jnp.full((2, nd), 2.0))
        if self.rd_eq:
            blocks.append(self.Md)
        return self._jv, jnp.concatenate(blocks, axis=0)

    def eval_hess_blocks(self, z, obj_factor, lam):
        ns = self.ns
        hss = obj_factor * jnp.concatenate(
            [jnp.full((ns,), float(self.sgn)), jnp.ones((ns,))]
        )
        return hss, obj_factor * self.Qd


def solve(ns: int = 400, nd: int = 100, **opts):
    kw = {}
    for key in ("convex_obj", "rankdefic_eq", "rankdefic_ineq"):
        if key in opts:
            kw[key] = opts.pop(key)
    o = NlpOptions()
    # test-3 driver options (NlpMdsEx2Driver.cpp): linear duals, mu0=0.1
    o.update(Hessian="analytical_exact", duals_update_type="linear", mu0=0.1)
    o.update(**opts)
    nlp = NlpMDS(MdsEx2(ns, nd, **kw), o)
    return FilterIPMNewton(nlp).run()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    ns = int(pos[0]) if pos else 400
    nd = int(pos[1]) if len(pos) > 1 else 100
    opts = {}
    if "-withrdJ" in argv:
        opts.update(rankdefic_eq=True, rankdefic_ineq=True)
    r = solve(ns, nd, **opts)
    print(f"Objective: {r.obj:.12e} status {r.status.name} iters {r.iterations}")
    if "-selfcheck" in argv:
        if not r.status.is_success:
            print(f"selfcheck FAILED: solver status {r.status.name}")
            return 1
        if abs((r.obj - SELFCHECK_OBJ) / SELFCHECK_OBJ) > 1e-6:
            print(f"selfcheck FAILED: obj {r.obj} vs saved {SELFCHECK_OBJ}")
            return 1
        print("selfcheck OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
