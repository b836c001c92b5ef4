"""Cross-validation adapter to scipy.optimize.

Parity with the reference's IpoptAdapter
(/root/reference/src/Drivers/IpoptAdapter/IpoptAdapter.hpp:48): adapt any
hiop_tpu problem to an independent solver for result cross-validation. The
reference adapts to Ipopt's TNLP — objective/gradient/constraints/Jacobian
plus the exact Lagrangian Hessian (eval_h) and a solution round trip with
multipliers; here the independent solver is scipy's SLSQP/trust-constr.
The adapter covers the same surface:

- dense-constrained, sparse (triplet densified), and MDS problems
  (blocks flattened — the reference dedicates TNLP mappings to the MDS
  interface too);
- exact Lagrangian Hessian forwarded to trust-constr when the problem
  provides one (eval_hess_lagr / eval_hess_vals / eval_hess_blocks);
- :func:`cross_validate` runs the independent solve and returns a
  round-trip report: both objectives, the primal gap, and the KKT
  stationarity residual of THEIR solution evaluated with OUR
  derivatives — the mutual-verification loop the reference drives with
  its hiop-vs-Ipopt drivers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from hiop_tpu.interface.base import INF


def _dense_jac_fn(problem, n, m):
    """Dense (m, n) Jacobian from whichever surface the problem offers:
    dense, sparse triplets, or MDS blocks."""
    if hasattr(problem, "eval_jac_blocks"):
        ns, _nd = problem.get_sparse_dense_blocks_info()
        jr, jc = (np.asarray(a) for a in problem.jac_sparse_structure())

        def jac(x):
            sp_vals, dense_blk = problem.eval_jac_blocks(np.asarray(x))
            J = np.zeros((m, n))
            np.add.at(J, (jr, jc), np.asarray(sp_vals, dtype=float))
            J[:, ns:] = np.asarray(dense_blk, dtype=float)
            return J

        return jac
    if hasattr(problem, "eval_jac_cons"):
        return lambda x: np.asarray(problem.eval_jac_cons(x), dtype=float)
    rows, cols = (np.asarray(a) for a in problem.jac_structure())

    def jac(x):
        vals = np.asarray(problem.eval_jac_vals(x), dtype=float)
        J = np.zeros((m, n))
        np.add.at(J, (rows, cols), vals)
        return J

    return jac


def _dense_hess_fn(problem, n, m):
    """Dense (n, n) Lagrangian Hessian H(x, obj_factor, lam) from whichever
    exact-second-order surface the problem offers (the reference forwards
    eval_h to Ipopt, IpoptAdapter.hpp eval_h); None if unavailable."""
    if hasattr(problem, "eval_hess_blocks") and hasattr(
        problem, "get_sparse_dense_blocks_info"
    ):
        ns, _nd = problem.get_sparse_dense_blocks_info()

        def hess(x, obj_factor, lam):
            hss, hdd = problem.eval_hess_blocks(
                np.asarray(x), float(obj_factor), np.asarray(lam, dtype=float)
            )
            H = np.zeros((n, n))
            H[np.arange(ns), np.arange(ns)] = np.asarray(hss, dtype=float)
            H[ns:, ns:] = np.asarray(hdd, dtype=float)
            return H

        return hess
    if hasattr(problem, "hess_structure") and hasattr(problem, "eval_hess_vals"):
        hr, hc = (np.asarray(a) for a in problem.hess_structure())
        off = hr != hc

        def hess(x, obj_factor, lam):
            vals = np.asarray(
                problem.eval_hess_vals(
                    np.asarray(x), float(obj_factor), np.asarray(lam, dtype=float)
                ),
                dtype=float,
            )
            H = np.zeros((n, n))
            np.add.at(H, (hr, hc), vals)
            np.add.at(H, (hc[off], hr[off]), vals[off])
            return H

        return hess
    if hasattr(problem, "eval_hess_lagr"):
        base = type(problem).eval_hess_lagr
        from hiop_tpu.interface.base import NlpProblem

        if base is getattr(NlpProblem, "eval_hess_lagr", None):
            return None

        def hess(x, obj_factor, lam):
            return np.asarray(
                problem.eval_hess_lagr(
                    np.asarray(x), float(obj_factor), np.asarray(lam, dtype=float)
                ),
                dtype=float,
            )

        return hess
    return None


def solve_with_scipy(problem, method: str = "SLSQP", maxiter: int = 1000,
                     x0=None, use_hessian: Optional[bool] = None):
    """Solve an NlpProblem with scipy.optimize.minimize; returns the scipy
    OptimizeResult. Accepts dense-constrained, sparse (triplets densified),
    and MDS (blocks flattened) problems; with method='trust-constr' and an
    exact-second-order problem the Lagrangian Hessian is forwarded
    (``use_hessian=False`` to disable)."""
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

    def _cons_flat(x):
        out = problem.eval_cons(np.asarray(x))
        if isinstance(out, tuple):
            # MDS/split style (c_eq, c_ineq) -> problem row order is
            # [eq; ineq] for the flattened adapter
            return np.concatenate(
                [np.asarray(out[0], dtype=float), np.asarray(out[1], dtype=float)]
            )
        return np.asarray(out, dtype=float)

    c = _cons_flat
    jac = _dense_jac_fn(problem, n, m)

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
            hess_l = _dense_hess_fn(problem, n, m) if use_hessian is not False else None
            if hess_l is not None:
                constraints.append(
                    NonlinearConstraint(
                        c, cl, cu, jac=jac,
                        hess=lambda x, v: hess_l(x, 0.0, v),
                    )
                )
            else:
                constraints.append(NonlinearConstraint(c, cl, cu, jac=jac))

    x_start = np.asarray(x0 if x0 is not None else problem.get_starting_point(), float)
    kwargs = {}
    if method != "SLSQP" and use_hessian is not False:
        hess_l = _dense_hess_fn(problem, n, m)
        if hess_l is not None:
            zero_lam = np.zeros(m)
            kwargs["hess"] = lambda x: hess_l(x, 1.0, zero_lam)
    return minimize(
        f, x_start, jac=g, bounds=bounds, constraints=constraints,
        method=method,
        options={"maxiter": maxiter, "ftol": 1e-12} if method == "SLSQP" else {"maxiter": maxiter},
        **kwargs,
    )


@dataclass
class CrossValidationReport:
    """Round-trip verification against the independent solver
    (IpoptAdapter.hpp's hiop-vs-Ipopt drivers): objective agreement,
    primal gap, and the KKT stationarity of THEIR solution under OUR
    derivatives (with their multipliers mapped back)."""

    ours_obj: float
    theirs_obj: float
    obj_rel_gap: float
    primal_inf_gap: float
    their_kkt_stationarity: float
    their_success: bool
    agrees: bool


def cross_validate(problem, ours_obj: float, ours_x=None,
                   method: str = "trust-constr", maxiter: int = 2000,
                   tol: float = 1e-5, x0=None) -> CrossValidationReport:
    """Run the independent solve and verify both directions.

    ``their_kkt_stationarity`` evaluates || grad f + J^T v - z || at the
    independent solution with the independent multipliers but OUR
    gradient/Jacobian — a derivative-consistency check no objective
    comparison can give (the reference's motivation for a full TNLP
    adapter rather than an objective diff)."""
    res = solve_with_scipy(problem, method=method, maxiter=maxiter, x0=x0)
    n, m = problem.get_prob_sizes()
    x = np.asarray(res.x, dtype=float)
    g = np.asarray(problem.eval_grad_f(x), dtype=float)
    stat = g.copy()
    if m and hasattr(res, "v") and res.v:
        jac = _dense_jac_fn(problem, n, m)
        # trust-constr: v[0] are the NonlinearConstraint multipliers
        stat = stat + _dense_jac_fn(problem, n, m)(x).T @ np.asarray(
            res.v[0], dtype=float
        )
        del jac
    if hasattr(res, "v") and len(getattr(res, "v", [])) > 1:
        # bound multipliers (scipy appends the variable-bound constraint)
        stat = stat + np.asarray(res.v[1], dtype=float)
    kkt = float(np.linalg.norm(stat, np.inf))
    gap = abs(float(ours_obj) - float(res.fun)) / max(1.0, abs(float(res.fun)))
    primal = (
        float(np.linalg.norm(np.asarray(ours_x, dtype=float) - x, np.inf))
        if ours_x is not None
        else float("nan")
    )
    return CrossValidationReport(
        ours_obj=float(ours_obj),
        theirs_obj=float(res.fun),
        obj_rel_gap=gap,
        primal_inf_gap=primal,
        their_kkt_stationarity=kkt,
        their_success=bool(res.success),
        # agreement is the objective gap; `their_success` is reported
        # separately (trust-constr often stops on maxiter with the
        # objective already converged to far better than tol)
        agrees=gap <= tol,
    )
