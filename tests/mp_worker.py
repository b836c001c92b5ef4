"""Worker for tests/test_multiprocess.py: solve a problem sharded over the
GLOBAL multi-process mesh and print one JSON result line per rank.

Launched by hiop_tpu.parallel.multiprocess.launch (the reference's 2-rank
MPI ctest analogue, CMakeLists.txt:508,512).  Must call initialize() before
any backend use, so the imports below stay lazy.

Problem selection via HIOP_TPU_MP_PROBLEM:
  dense_ex1 (default) — QN dense Ex1 sharded solve (HIOP_TPU_MP_N)
  acopf             — Newton MDS ACOPF B=HIOP_TPU_MP_N sharded solve
  pridec            — PriDec with per-rank scenario partition + allreduce
                      (the reference's 2-rank PriDec MPI run,
                      hiopAlgPrimalDecomp.cpp:790)
  qn_large          — large-n QN timing anchor (capped iterations; reports
                      s/iter over the measured window, SURVEY.md §5.7)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiop_tpu.parallel.multiprocess import initialize  # noqa: E402


def _dense_ex1(pid, nproc):
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation
    from examples.dense_ex1 import DenseConsEx1

    n = int(os.environ.get("HIOP_TPU_MP_N", "512"))
    o = NlpOptions()
    o.update(verbosity_level=0)
    nlp = NlpDenseConstraints(DenseConsEx1(n), o)
    mesh = make_mesh()  # global mesh spanning every process
    shard_formulation(nlp, mesh)
    r = FilterIPMQuasiNewton(nlp).run()
    return dict(
        obj=float(r.obj), iterations=int(r.iterations), status=r.status.name,
        devices=mesh.devices.size,
    )


def _acopf(pid, nproc):
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation
    from examples.acopf_mds import AcopfMds

    B = int(os.environ.get("HIOP_TPU_MP_N", "32"))
    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0,
    )
    nlp = NlpMDS(AcopfMds(B), o)
    mesh = make_mesh()
    shard_formulation(nlp, mesh)
    r = FilterIPMNewton(nlp).run()
    return dict(
        obj=float(r.obj), iterations=int(r.iterations), status=r.status.name,
        devices=mesh.devices.size,
    )


def _pridec(pid, nproc):
    import jax

    from hiop_tpu import PriDecOptions, PriDecSolver
    from examples.pridec_ex1 import PriDecEx1

    class PerScenario(PriDecEx1):
        # mask the batched path: multi-process PriDec takes the per-rank
        # static partition + cross-process allreduce leg (run_local,
        # hiopAlgPrimalDecomp.cpp:1269)
        batched = False

    S = int(os.environ.get("HIOP_TPU_MP_N", "24"))
    prob = PerScenario(nx=8, S=S)
    o = PriDecOptions()
    o.update(verbosity_level=0, max_iter=60)
    r = PriDecSolver(prob, o).run()
    return dict(
        obj=float(r.obj), iterations=int(r.iterations), status=r.status.name,
        devices=len(jax.devices()),
    )


def _qn_large(pid, nproc):
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation
    from examples.dense_ex1 import DenseConsEx1

    n = int(os.environ.get("HIOP_TPU_MP_N", "2000000"))
    max_iter = int(os.environ.get("HIOP_TPU_MP_MAXITER", "8"))
    o = NlpOptions()
    o.update(verbosity_level=0, max_iter=max_iter)
    nlp = NlpDenseConstraints(DenseConsEx1(n), o)
    mesh = make_mesh()
    shard_formulation(nlp, mesh)
    t0 = time.time()
    r = FilterIPMQuasiNewton(nlp).run()
    wall_cold = time.time() - t0
    # warm re-solve on the same formulation: the fused executable is cached
    # on the nlp, so this window excludes compilation — the number
    # comparable to the reference's first-20-iters s/iter (BASELINE.md)
    t0 = time.time()
    r = FilterIPMQuasiNewton(nlp).run()
    wall = time.time() - t0
    return dict(
        obj=float(r.obj), iterations=int(r.iterations), status=r.status.name,
        devices=mesh.devices.size, n=n, wall_s=round(wall, 2),
        wall_cold_s=round(wall_cold, 2),
        s_per_iter=round(wall / max(r.iterations, 1), 3),
    )


def main() -> int:
    pid, nproc = initialize()
    import jax

    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    which = os.environ.get("HIOP_TPU_MP_PROBLEM", "dense_ex1")
    fn = {
        "dense_ex1": _dense_ex1,
        "acopf": _acopf,
        "pridec": _pridec,
        "qn_large": _qn_large,
    }[which]
    out = fn(pid, nproc)
    out.update(rank=pid, world=nproc, problem=which)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
