"""PriDec solver tests."""

import numpy as np
import pytest

import examples.pridec_ex1 as px1
from hiop_tpu import PriDecOptions


def test_pridec_ex1_converges_to_analytic():
    solver = px1.solve(10, 30, verbosity_level=0)
    r = solver.run()
    assert r.status.is_success
    assert abs(r.obj - (0.5 * 30 * 10 + 0.5 * 10)) < 1e-5


def test_pridec_ex1_serial_fallback_matches_batched():
    p = px1.PriDecEx1(6, 12)
    x0 = np.linspace(0.0, 1.0, 6)
    rv_b, gr_b = p.eval_rterms_batched(np.arange(12), x0)
    rv_s = [p.eval_f_rterm(i, x0) for i in range(12)]
    gr_s = np.stack([p.eval_grad_rterm(i, x0) for i in range(12)])
    assert np.allclose(np.asarray(rv_b), rv_s, atol=1e-12)
    assert np.allclose(np.asarray(gr_b), gr_s, atol=1e-12)


def test_pridec_options():
    o = PriDecOptions()
    assert o.num("alpha_min") == 1e-5
    o.set("alpha_max", 1e4)
    assert o.num("alpha_max") == 1e4


def test_pridec_ex2_nlp_recourse():
    """Scenario evaluations that are themselves IPM solves (small size for
    test speed; the full reference selfcheck nx=20 S=5 passes via
    examples/pridec_ex2.py -selfcheck)."""
    import examples.pridec_ex2 as px2

    solver = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15)
    r = solver.run()
    assert r.status.is_success
    assert np.isfinite(r.obj)


def test_partition_scenarios_covers_all():
    from hiop_tpu.parallel.scenario_sched import partition_scenarios

    for S in (1, 7, 8, 100):
        for P in (1, 3, 8):
            parts = [partition_scenarios(S, P, r) for r in range(P)]
            allidx = np.concatenate(parts)
            assert sorted(allidx.tolist()) == list(range(S))
            sizes = [p.size for p in parts]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_dynamic_schedule_matches_serial():
    from hiop_tpu.parallel.scenario_sched import dynamic_schedule

    rng = np.random.default_rng(0)
    vals = rng.normal(size=16)
    grads = rng.normal(size=(16, 5))

    def eval_one(i):
        return vals[i], grads[i]

    r1, g1, n1 = dynamic_schedule(eval_one, range(16), 1)
    r4, g4, n4 = dynamic_schedule(eval_one, range(16), 4)
    assert n1 == n4 == 16
    np.testing.assert_allclose(r4, vals.sum(), rtol=1e-12)
    np.testing.assert_allclose(np.sort(g4), np.sort(g1), rtol=1e-12)
    np.testing.assert_allclose(g4, grads.sum(axis=0), rtol=1e-12)


def test_dynamic_schedule_propagates_errors():
    from hiop_tpu.parallel.scenario_sched import dynamic_schedule

    def eval_one(i):
        if i == 3:
            raise RuntimeError("scenario 3 failed")
        return 1.0, np.ones(2)

    with pytest.raises(RuntimeError, match="scenario 3"):
        dynamic_schedule(eval_one, range(8), 4)


def test_pridec_dynamic_workers_match_serial():
    """NLP-recourse scenarios (batched=False) through the thread-dealing
    scheduler vs the serial loop: same converged objective."""
    import examples.pridec_ex2 as px2

    r1 = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15).run()
    r2 = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15,
                   num_local_workers=3).run()
    assert r1.status.is_success and r2.status.is_success
    assert abs(r1.obj - r2.obj) <= 1e-8 * (1 + abs(r1.obj))


def test_pridec_accum_local_single_process():
    """accum_local=true in one process: static partition covering all
    scenarios + no-op allreduce matches the default path exactly."""
    import examples.pridec_ex2 as px2

    r1 = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15).run()
    r2 = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15,
                   accum_local="true").run()
    assert r2.status.is_success
    assert abs(r1.obj - r2.obj) <= 1e-12 * (1 + abs(r1.obj))


def test_pridec_sharded_scenarios_match_unsharded():
    """Mesh-sharded scenario evaluation (shard_map + psum over the 8-device
    test mesh) reproduces the single-device batched sums exactly, including
    when S is not a device multiple (padding path)."""
    import jax
    from hiop_tpu.optimization.pridec import PriDecSolver

    assert len(jax.devices()) == 8  # conftest virtual mesh
    for S in (16, 13):
        p = px1.PriDecEx1(6, S)
        x0 = np.linspace(0.0, 1.0, 6)
        o_y = PriDecOptions(); o_y.set("shard_scenarios", "yes")
        o_n = PriDecOptions(); o_n.set("shard_scenarios", "no")
        s_y = PriDecSolver(p, o_y)
        s_n = PriDecSolver(p, o_n)
        rv_y, gr_y = s_y._eval_recourse(x0)
        rv_n, gr_n = s_n._eval_recourse(x0)
        assert abs(rv_y - rv_n) < 1e-10 * max(1.0, abs(rv_n))
        assert np.allclose(gr_y, gr_n, atol=1e-10)


def test_pridec_sharded_full_solve():
    solver = px1.solve(10, 32, verbosity_level=0, shard_scenarios="yes")
    r = solver.run()
    assert r.status.is_success
    assert abs(r.obj - (0.5 * 32 * 10 + 0.5 * 10)) < 1e-5


def test_pridec_sharded_auto_falls_back_for_untraceable_batched():
    """A batched=True problem whose eval_rterms_batched is NOT jax-traceable
    (PriDecEx2Batched runs nested numpy solves) must fall back to the
    single-dispatch path under shard_scenarios=auto instead of crashing,
    even when S >= n_devices (regression: TracerArrayConversionError)."""
    import examples.pridec_ex2 as px2

    solver = px2.solve(6, 3, 16, batched=True, verbosity_level=0)
    r = solver.run()
    assert r.status.is_success
    # the unsharded batched reference
    solver2 = px2.solve(6, 3, 16, batched=True, verbosity_level=0,
                        shard_scenarios="no")
    r2 = solver2.run()
    assert abs(r.obj - r2.obj) < 1e-8 * max(1.0, abs(r2.obj))


def test_solve_master_receives_options_file(tmp_path):
    """options_file_master_prob is forwarded into solve_master when the
    implementation accepts it (hiopAlgPrimalDecomp.cpp:880), and omitted
    for implementations without the parameter."""
    from hiop_tpu.optimization.pridec import PriDecSolver
    from hiop_tpu.utils.options import PriDecOptions
    from examples.pridec_ex1 import PriDecEx1

    seen = []

    class Ex1WithFile(PriDecEx1):
        def solve_master(self, x, include_r, evaluator=None, options_file=""):
            seen.append(options_file)
            return super().solve_master(x, include_r, evaluator=evaluator)

    o = PriDecOptions()
    o.update(verbosity_level=0, max_iter=3)
    o.set("options_file_master_prob", "my_master.options")
    PriDecSolver(Ex1WithFile(12), o).run()
    assert seen and all(f == "my_master.options" for f in seen)

    # legacy signature (no options_file) keeps working
    o2 = PriDecOptions()
    o2.update(verbosity_level=0, max_iter=3)
    r = PriDecSolver(PriDecEx1(12), o2).run()
    assert r.iterations >= 1
