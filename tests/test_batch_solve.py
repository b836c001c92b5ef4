"""Batched whole-solves (vmap over jit_mode=solve): every scenario of a
parametric NLP family solved in ONE XLA program. Cross-checked against
individual solves — the reference has no equivalent (its multi-instance
driver hpc_multisolves.cpp runs one CPU solve at a time per rank)."""

import numpy as np
import jax.numpy as jnp

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    NlpDenseConstraints,
    NlpOptions,
)
from hiop_tpu.optimization.batch_solve import ParametricDenseNlp, solve_batched


def _family():
    n = 6

    def f(x, th):
        return jnp.sum((x - th) ** 2) + 0.1 * jnp.sum(x**4)

    def c(x, th):
        return jnp.stack([jnp.sum(x), x[0] * x[1]])

    o = NlpOptions()
    o.update(Hessian="analytical_exact", verbosity_level=0)
    pnlp = ParametricDenseNlp(
        f, c,
        xl=np.full(n, -2.0), xu=np.full(n, 5.0),
        cl=np.array([2.0, -1.0]), cu=np.array([2.0, 1.0]),
        x0=np.full(n, 0.5), th0=np.ones(n), options=o,
    )
    return n, f, c, pnlp


def test_batched_matches_individual_solves():
    n, f, c, pnlp = _family()
    vals = (0.3, 0.7, 1.0, 1.4)
    ths = jnp.stack([jnp.full((n,), v) for v in vals])
    res = solve_batched(pnlp, ths)
    assert res.x.shape == (4, n)
    for k, v in enumerate(vals):
        p = AutoDiffNlpProblem(
            f=lambda x, v=v: f(x, jnp.full((n,), v)),
            c=lambda x: c(x, None),
            xl=np.full(n, -2.0), xu=np.full(n, 5.0),
            cl=np.array([2.0, -1.0]), cu=np.array([2.0, 1.0]),
            x0=np.full(n, 0.5),
        )
        o = NlpOptions()
        o.update(
            Hessian="analytical_exact", verbosity_level=0, scaling_type="none"
        )
        r = FilterIPMNewton(NlpDenseConstraints(p, o)).run()
        assert abs(r.obj - res.obj[k]) < 1e-7
        assert np.allclose(np.asarray(res.x[k]), np.asarray(r.x), atol=1e-5)


def test_batched_reuses_compiled_program():
    n, _f, _c, pnlp = _family()
    ths = jnp.stack([jnp.full((n,), v) for v in (0.5, 0.9)])
    r1 = solve_batched(pnlp, ths)
    assert getattr(pnlp, "_batched_solve_cache", None) is not None
    r2 = solve_batched(pnlp, ths)
    assert np.allclose(r1.obj, r2.obj)


def test_pridec_batched_recourse_matches_host_loop():
    """PriDec Ex2 with batched NLP-recourse solves must reproduce the
    host-loop (per-scenario FilterIPMNewton) solver's master objective."""
    import examples.pridec_ex2 as ex2
    from hiop_tpu import PriDecOptions

    o1 = PriDecOptions()
    r_host = __import__("hiop_tpu").PriDecSolver(ex2.PriDecEx2(12, 5, 4), o1).run()
    o2 = PriDecOptions()
    r_batch = __import__("hiop_tpu").PriDecSolver(
        ex2.PriDecEx2Batched(12, 5, 4), o2
    ).run()
    assert abs(r_host.obj - r_batch.obj) < 1e-6


def test_pridec_batched_varied_scenarios():
    """Per-scenario samples: batched rvals/grads must match per-scenario
    host recourse solves with the same xi."""
    import examples.pridec_ex2 as ex2

    rng = np.random.default_rng(3)
    nx, nS, S = 10, 4, 3
    xis = 1.0 + 0.2 * rng.standard_normal((S, nS))
    pb = ex2.PriDecEx2Batched(nx, nS, S, xis=xis)
    x = rng.uniform(0.6, 1.4, nx)
    rvals, grads = pb.eval_rterms_batched(np.arange(S), x)
    for i in range(S):
        ph = ex2.PriDecEx2(nx, nS, S)
        ph.xi = xis[i]
        rv = ph.eval_f_rterm(i, x)
        gr = ph.eval_grad_rterm(i, x)
        assert abs(float(rvals[i]) - rv) < 1e-6, (i, float(rvals[i]), rv)
        assert np.allclose(np.asarray(grads[i]), gr, atol=1e-5)


def test_batched_mds_family_matches_individual():
    """ParametricMdsNlp: a family of MDS NLPs (MdsEx1 with a per-scenario
    objective shift) solved by ONE vmapped fused MDS program, cross-checked
    against individual general-loop solves."""
    from examples.mds_ex1 import MdsEx1
    from hiop_tpu import FilterIPMNewton, NlpMDS
    from hiop_tpu.optimization.batch_solve import ParametricMdsNlp, solve_batched

    ns, nd = 40, 12

    class ShiftedMds(MdsEx1):
        """Objective x-target shifted by the scalar scenario parameter."""

        def __init__(self, shift=1.0):
            super().__init__(ns, nd)
            self.shift = shift

        def eval_f(self, z, th=None):
            t = self.shift if th is None else th
            x, s, y = self._split(z)
            return (
                0.5 * jnp.sum(x * (x - t))
                + 0.5 * y @ (self.Qd @ y)
                + 0.5 * jnp.sum(s * s)
            )

        def eval_grad_f(self, z, th=None):
            t = self.shift if th is None else th
            x, s, y = self._split(z)
            return jnp.concatenate([x - 0.5 * t, s, self.Qd @ y])

        def eval_cons(self, z, th=None):
            return super().eval_cons(z)

        def eval_jac_blocks(self, z, th=None):
            return super().eval_jac_blocks(z)

        def eval_hess_blocks(self, z, obj_factor, lam, th=None):
            return super().eval_hess_blocks(z, obj_factor, lam)

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", verbosity_level=0, tolerance=1e-6,
        mu0=0.1, duals_init="zero", duals_update_type="linear",
    )
    pnlp = ParametricMdsNlp(ShiftedMds(), th0=jnp.asarray(1.0), options=o)
    shifts = (0.6, 1.0, 1.5)
    res = solve_batched(pnlp, jnp.asarray(shifts))
    for k, t in enumerate(shifts):
        o1 = NlpOptions()
        o1.update(
            Hessian="analytical_exact", verbosity_level=0, tolerance=1e-6,
            mu0=0.1, duals_init="zero", duals_update_type="linear",
            jit_mode="none", scaling_type="none",
        )
        r = FilterIPMNewton(NlpMDS(ShiftedMds(t), o1)).run()
        assert r.status.is_success
        # both paths converge to err_nlp <= 1e-6; objective agreement is
        # bounded by the stopping tolerance, not machine precision
        assert abs(r.obj - res.obj[k]) < 1e-4 * max(1.0, abs(r.obj))
        assert np.allclose(np.asarray(res.x[k]), np.asarray(r.x), atol=1e-3)
