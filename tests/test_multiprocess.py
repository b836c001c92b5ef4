"""Real multi-process distributed execution tests (SURVEY.md §2.9).

The reference CI runs actual 2-rank MPI jobs (reference
CMakeLists.txt:508,512); the TPU-native equivalent spawns two coordinated
Python processes over jax.distributed with gloo CPU collectives and checks
the distributed solve reproduces the single-process trajectory exactly
(same iteration count, same objective to reduction-roundoff) — the
iteration-table equivalence technique of SURVEY.md §4.3.
"""

import json
import os
import sys

import pytest

from hiop_tpu.parallel.multiprocess import launch

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mp_worker.py")


def _run_workers(num_processes=2, devices_per_process=2, n=512, timeout=420,
                 problem="dense_ex1", **env):
    e = {"HIOP_TPU_MP_N": n, "HIOP_TPU_MP_PROBLEM": problem}
    e.update(env)
    results = launch(
        [_WORKER],
        num_processes=num_processes,
        devices_per_process=devices_per_process,
        platform="cpu",
        timeout=timeout,
        extra_env=e,
        cwd=_REPO,
    )
    out = []
    for r in results:
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out.append(json.loads(line))
    return out


def _solve_single(n=512):
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
    from examples.dense_ex1 import DenseConsEx1

    o = NlpOptions()
    o.update(verbosity_level=0)
    return FilterIPMQuasiNewton(NlpDenseConstraints(DenseConsEx1(n), o)).run()


def test_two_process_solve_matches_single_process():
    """2 processes x 2 virtual devices = a 4-device global mesh; the
    sharded QN solve must reproduce the single-process run."""
    ranks = _run_workers(num_processes=2, devices_per_process=2, n=512)
    assert len(ranks) == 2
    for r in ranks:
        assert r["world"] == 2
        assert r["devices"] == 4
        assert r["status"] == "Solve_Success"
    # every rank reports the identical result (replicated scalars agree)
    assert ranks[0]["iterations"] == ranks[1]["iterations"]
    assert ranks[0]["obj"] == pytest.approx(ranks[1]["obj"], abs=0.0)

    r1 = _solve_single(512)
    assert ranks[0]["iterations"] == r1.iterations
    assert ranks[0]["obj"] == pytest.approx(r1.obj, rel=1e-9, abs=1e-9)


def test_two_process_newton_mds_acopf_matches_single():
    """2-process Newton/MDS ACOPF equivalence (VERDICT r3 #6): the sharded
    exact-Hessian MDS solve over a cross-process gloo mesh reproduces the
    single-process run — the 2-rank MPI ctest bar on the Newton path."""
    ranks = _run_workers(
        num_processes=2, devices_per_process=1, n=32, problem="acopf",
    )
    assert len(ranks) == 2
    for r in ranks:
        assert r["world"] == 2 and r["devices"] == 2
        assert r["status"] == "Solve_Success"
    assert ranks[0]["iterations"] == ranks[1]["iterations"]
    assert ranks[0]["obj"] == pytest.approx(ranks[1]["obj"], abs=0.0)

    from examples.acopf_mds import SELFCHECK
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
    from examples.acopf_mds import AcopfMds

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
             mu0=0.1, verbosity_level=0)
    r1 = FilterIPMNewton(NlpMDS(AcopfMds(32), o)).run()
    assert ranks[0]["iterations"] == r1.iterations
    assert ranks[0]["obj"] == pytest.approx(r1.obj, rel=1e-8, abs=1e-8)
    ref, tol = SELFCHECK[32]
    assert abs(ranks[0]["obj"] - ref) <= tol * max(1.0, abs(ref))


def test_two_process_pridec_matches_single():
    """2-process PriDec: per-rank scenario partition + cross-process
    allreduce must reproduce the single-process PriDec Ex1 solve (the
    reference's PriDec MPI run, hiopAlgPrimalDecomp.cpp:790)."""
    ranks = _run_workers(
        num_processes=2, devices_per_process=1, n=24, problem="pridec",
    )
    assert len(ranks) == 2
    for r in ranks:
        assert r["world"] == 2
        assert r["status"] in ("Solve_Success", "Max_Iter_Exceeded")
    assert ranks[0]["obj"] == pytest.approx(ranks[1]["obj"], abs=0.0)
    assert ranks[0]["iterations"] == ranks[1]["iterations"]

    import examples.pridec_ex1 as pex1
    r1 = pex1.solve(nx=8, S=24, verbosity_level=0, max_iter=60).run()
    assert ranks[0]["iterations"] == r1.iterations
    assert ranks[0]["obj"] == pytest.approx(r1.obj, rel=1e-8, abs=1e-8)


@pytest.mark.slow
def test_two_process_qn_large_n_timing():
    """Large-n anchor for §5.7: a 2-process x 2-device QN solve at n=2e6
    completes capped iterations and reports s/iter (recorded in
    docs/distributed.md; the reference's corresponding figure is 0.259
    s/iter at n=33.5M on 288 cores, BASELINE.md)."""
    ranks = _run_workers(
        num_processes=2, devices_per_process=2, n=2_000_000,
        problem="qn_large", timeout=900,
    )
    assert len(ranks) == 2
    for r in ranks:
        assert r["world"] == 2 and r["devices"] == 4
        assert r["iterations"] >= 1
    print(
        f"\n2-process QN n=2e6: {ranks[0]['iterations']} iters, "
        f"{ranks[0]['wall_s']}s wall, {ranks[0]['s_per_iter']} s/iter"
    )


def test_launcher_surfaces_worker_failure(tmp_path):
    bad = tmp_path / "bad_worker.py"
    bad.write_text("import sys; sys.exit(3)\n")
    with pytest.raises(RuntimeError, match="rank .*rc=3|rc=3"):
        launch([str(bad)], num_processes=2, devices_per_process=1, timeout=120)
