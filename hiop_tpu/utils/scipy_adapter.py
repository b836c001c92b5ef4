"""Cross-validation adapter to scipy.optimize.

Parity with the reference's IpoptAdapter
(/root/reference/src/Drivers/IpoptAdapter/IpoptAdapter.hpp:48): adapt any
hiop_tpu problem to an independent solver for result cross-validation. The
reference adapts to Ipopt's TNLP; here the independent solver is scipy's
SLSQP/trust-constr, which is how several of this repo's example selfcheck
values were independently verified (see examples/dense_ex2.py notes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hiop_tpu.interface.base import INF


def solve_with_scipy(problem, method: str = "SLSQP", maxiter: int = 1000, x0=None):
    """Solve an NlpProblem with scipy.optimize.minimize; returns the scipy
    OptimizeResult. Requires a dense Jacobian (eval_jac_cons) or a
    SparseProblem (densified)."""
    from scipy.optimize import NonlinearConstraint, minimize

    n, m = problem.get_prob_sizes()
    xl, xu = (np.asarray(a, dtype=float) for a in problem.get_vars_info())
    cl, cu = (np.asarray(a, dtype=float) for a in problem.get_cons_info())

    def f(x):
        return float(problem.eval_f(x))

    def g(x):
        return np.asarray(problem.eval_grad_f(x), dtype=float)

    def c(x):
        return np.asarray(problem.eval_cons(x), dtype=float)

    def jac(x):
        if hasattr(problem, "eval_jac_cons"):
            return np.asarray(problem.eval_jac_cons(x), dtype=float)
        rows, cols = problem.jac_structure()
        vals = np.asarray(problem.eval_jac_vals(x), dtype=float)
        J = np.zeros((m, n))
        np.add.at(J, (np.asarray(rows), np.asarray(cols)), vals)
        return J

    bounds = [
        (None if lo <= -INF else lo, None if hi >= INF else hi)
        for lo, hi in zip(xl, xu)
    ]
    constraints = []
    if m:
        if method == "SLSQP":
            eq = cl == cu
            if eq.any():
                idx = np.nonzero(eq)[0]
                constraints.append(
                    {
                        "type": "eq",
                        "fun": lambda x, i=idx: c(x)[i] - cl[i],
                        "jac": lambda x, i=idx: jac(x)[i],
                    }
                )
            ineq = ~eq
            for bound, sign in ((cl, 1.0), (cu, -1.0)):
                sel = np.nonzero(ineq & (np.abs(bound) < INF))[0]
                if sel.size:
                    constraints.append(
                        {
                            "type": "ineq",
                            "fun": lambda x, i=sel, b=bound, s=sign: s * (c(x)[i] - b[i]),
                            "jac": lambda x, i=sel, s=sign: s * jac(x)[i],
                        }
                    )
        else:
            constraints.append(NonlinearConstraint(c, cl, cu, jac=jac))

    x_start = np.asarray(x0 if x0 is not None else problem.get_starting_point(), float)
    return minimize(
        f, x_start, jac=g, bounds=bounds, constraints=constraints,
        method=method, options={"maxiter": maxiter, "ftol": 1e-12} if method == "SLSQP" else {"maxiter": maxiter},
    )
