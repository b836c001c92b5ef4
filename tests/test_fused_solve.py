"""jit_mode=solve: the whole-solve-in-one-XLA-program path must reproduce
the per-iteration fused path (jit_mode=iteration) exactly — same status,
same iteration count, same objective — the same equivalence contract the
reference enforces between its CPU and GPU runs with iteration-table diffs
(src/Drivers/MDS/CMakeLists.txt:54-74)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    FilterIPMQuasiNewton,
    NlpDenseConstraints,
    NlpOptions,
)


def _problem():
    return AutoDiffNlpProblem(
        f=lambda x: jnp.sum((x - 1.0) ** 2) + 0.1 * jnp.sum(x**4),
        c=lambda x: jnp.stack([jnp.sum(x), x[0] * x[1]]),
        xl=np.full(6, -2.0),
        xu=np.full(6, 5.0),
        cl=np.array([2.0, -1.0]),
        cu=np.array([2.0, 1.0]),
        x0=np.full(6, 0.5),
    )


def _solve(cls, hessian, jit_mode, **extra):
    opts = NlpOptions()
    opts.update(jit_mode=jit_mode, Hessian=hessian, verbosity_level=0, **extra)
    return cls(NlpDenseConstraints(_problem(), opts)).run()


@pytest.mark.parametrize(
    "cls,hessian",
    [
        (FilterIPMNewton, "analytical_exact"),
        (FilterIPMQuasiNewton, "quasinewton_approx"),
    ],
)
def test_solve_mode_matches_iteration_mode(cls, hessian):
    r_it = _solve(cls, hessian, "iteration")
    r_sv = _solve(cls, hessian, "solve")
    assert r_sv.status == r_it.status
    assert r_sv.iterations == r_it.iterations
    assert abs(r_sv.obj - r_it.obj) < 1e-10


def test_solve_mode_max_iter():
    r = _solve(FilterIPMNewton, "analytical_exact", "solve", max_iter=3)
    assert r.iterations == 3


def test_solve_mode_callback_override_falls_back():
    """A user iterate_callback cannot run inside one XLA program; the solver
    must route such problems through the per-iteration path and still honor
    an early stop."""
    p = _problem()
    calls = []

    class Stopper(type(p)):
        def iterate_callback(self, info):
            calls.append(info.iter)
            return info.iter < 2

    p.__class__ = Stopper
    opts = NlpOptions()
    opts.update(jit_mode="solve", Hessian="analytical_exact", verbosity_level=0)
    r = FilterIPMNewton(NlpDenseConstraints(p, opts)).run()
    assert calls, "iterate_callback was never invoked"
    assert r.status.name == "User_Stopped"


def test_sharded_fused_solve_matches_single():
    """jit_mode=solve with the variable axis sharded over the 8-device mesh:
    the ENTIRE distributed QN solve (psum'd reductions, replicated Schur
    solve, on-device filter + mu schedule) runs as one collective XLA
    program and must match the single-device fused solve."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    import examples.dense_ex1 as ex1
    from hiop_tpu import NlpDenseConstraints
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation

    def run(sharded):
        o = NlpOptions()
        o.update(verbosity_level=0, jit_mode="solve")
        nlp = NlpDenseConstraints(ex1.DenseConsEx1(512), o)
        if sharded:
            shard_formulation(nlp, make_mesh(8))
        return FilterIPMQuasiNewton(nlp).run()

    r1 = run(False)
    r8 = run(True)
    assert r8.status == r1.status
    assert r8.iterations == r1.iterations
    assert abs(r8.obj - r1.obj) <= 1e-9 * (1 + abs(r1.obj))


def test_fused_solve_warm_start():
    """Warm start now runs inside the fused paths: starting from the
    optimum's primal-dual point converges in a handful of iterations and
    matches the general loop."""
    import numpy as np
    import jax.numpy as jnp
    from hiop_tpu import (
        AutoDiffNlpProblem, FilterIPMNewton, NlpDenseConstraints, NlpOptions,
    )

    n = 6
    def make_p():
        p = AutoDiffNlpProblem(
            f=lambda x: 0.5 * jnp.sum(x**2),
            c=lambda x: jnp.sum(x)[None],
            xl=-1e20 * np.ones(n), xu=1e20 * np.ones(n),
            cl=np.array([1.0]), cu=np.array([1.0]),
            x0=np.zeros(n),
        )
        x_star = np.full(n, 1.0 / n)
        p.get_warmstart_point = lambda: (
            x_star, np.zeros(n), np.zeros(n),
            np.array([-1.0 / n]), np.zeros(0), None, None, None,
        )
        return p

    def run(jm):
        o = NlpOptions()
        o.update(
            verbosity_level=0, warm_start="yes", Hessian="analytical_exact",
            duals_update_type="linear", jit_mode=jm,
        )
        return FilterIPMNewton(NlpDenseConstraints(make_p(), o)).run()

    r_f = run("solve")
    r_g = run("none")
    assert r_f.status.is_success and r_g.status.is_success
    assert r_f.iterations <= 6
    assert abs(r_f.obj - r_g.obj) < 1e-8


def test_chunked_fused_solve_matches_single_dispatch(monkeypatch):
    """The host-chained bounded-dispatch mode (HIOP_TPU_FUSED_CHUNK) must
    reproduce the single-dispatch solve exactly — same iterations, same
    objective — since each chunk resumes from the carried device state."""
    r_one = _solve(FilterIPMNewton, "analytical_exact", "solve")
    monkeypatch.setenv("HIOP_TPU_FUSED_CHUNK", "2")
    r_chunk = _solve(FilterIPMNewton, "analytical_exact", "solve")
    assert r_chunk.status == r_one.status
    assert r_chunk.iterations == r_one.iterations
    assert abs(r_chunk.obj - r_one.obj) < 1e-12


def test_fused_to_general_handoff_resumes():
    """When the fused program exits needs-host, the general loop must
    RESUME from the fused iterate and barrier parameter (the reference's
    quick->safe switching keeps the iterate, switch_to_safer_KKT
    hpp:468) — not restart from scratch. Seed a handoff at a mid-solve
    state and check the general loop continues the iteration count and
    converges."""
    import numpy as np
    import jax.numpy as jnp

    from examples.acopf_mds import AcopfMds
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
    from hiop_tpu.optimization import fused_newton as fn

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0, kkt_fact_dtype="float32",
        mp_schedule="adaptive", linear_solver_dense="ldl_nopiv",
        jit_mode="solve", max_iter=300,
    )
    nlp = NlpMDS(AcopfMds(16), o)
    solver = FilterIPMNewton(nlp)

    # run the fused solve a few iterations to obtain a genuine mid state
    mu = solver.mu0
    tau = max(solver.tau_min, 1.0 - mu)
    state, consts = solver._fused_init()
    term = dict(
        eps_tol=solver.eps_tol, rel_tol=solver.rel_tol,
        accep_tol=solver.accep_tol, accep_iters=solver.accep_iters,
        max_iter=solver.max_iter, kappa_eps=solver.kappa_eps,
        kappa_mu=solver.kappa_mu, theta_mu=solver.theta_mu,
        tau_min=solver.tau_min,
        comp_tol_scaled=solver.comp_tol / nlp.scale_obj,
    )
    solve = fn.build_fused_solve(nlp, consts, term, mode="newton")
    state, mu_dev, it_num, st, err, hist, carry = solve(
        state, mu, tau, solver.theta_min, solver.theta_max, 300, it_stop=8
    )
    assert int(it_num) == 8 and int(st) == 0

    solver2 = FilterIPMNewton(nlp)
    solver2._fused_handoff = (state.it, float(mu_dev), int(it_num))
    r = solver2._run_general()
    assert r.status.is_success
    # resumed, not restarted: total iterations include the 8-iteration
    # fused prefix and stay below a from-scratch general solve's count
    assert r.iterations > 8
    ref, tol = 13.167871626392, 1e-5
    from examples.acopf_mds import SELFCHECK
    # objective must match the B=16 optimum from the cross-check test family
    r_ref = FilterIPMNewton(NlpMDS(AcopfMds(16), o)).run()
    assert abs(r.obj - r_ref.obj) <= 1e-6 * max(1.0, abs(r_ref.obj))
