"""Worker for tests/test_multiprocess.py: solve dense Ex1/Ex2 sharded over
the GLOBAL multi-process mesh and print one JSON result line per rank.

Launched by hiop_tpu.parallel.multiprocess.launch (the reference's 2-rank
MPI ctest analogue, CMakeLists.txt:508,512).  Must call initialize() before
any backend use, so the imports below stay lazy.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiop_tpu.parallel.multiprocess import initialize  # noqa: E402


def main() -> int:
    pid, nproc = initialize()
    import jax

    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation
    from examples.dense_ex1 import DenseConsEx1

    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    n = int(os.environ.get("HIOP_TPU_MP_N", "512"))
    o = NlpOptions()
    o.update(verbosity_level=0)
    nlp = NlpDenseConstraints(DenseConsEx1(n), o)
    mesh = make_mesh()  # global mesh spanning every process
    n_global_devices = mesh.devices.size
    shard_formulation(nlp, mesh)
    r = FilterIPMQuasiNewton(nlp).run()
    print(
        json.dumps(
            dict(
                rank=pid,
                world=nproc,
                devices=n_global_devices,
                obj=float(r.obj),
                iterations=int(r.iterations),
                status=r.status.name,
            )
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
