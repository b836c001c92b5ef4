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


def _run_workers(num_processes=2, devices_per_process=2, n=512, timeout=420):
    results = launch(
        [_WORKER],
        num_processes=num_processes,
        devices_per_process=devices_per_process,
        platform="cpu",
        timeout=timeout,
        extra_env={"HIOP_TPU_MP_N": n},
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


def test_launcher_surfaces_worker_failure(tmp_path):
    bad = tmp_path / "bad_worker.py"
    bad.write_text("import sys; sys.exit(3)\n")
    with pytest.raises(RuntimeError, match="rank .*rc=3|rc=3"):
        launch([str(bad)], num_processes=2, devices_per_process=1, timeout=120)
