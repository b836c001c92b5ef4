"""Repeated-solves throughput driver — the TPU analog of the reference's
multi-instance stress test (/root/reference/src/Drivers/MDS/
hpc_multisolves.cpp:18-77: 5 MDS Ex1 solves per MPI rank, timed, to probe
CPU-affinity / GPU-stream multiprocessing).

On TPU the equivalent concern is XLA program reuse: the first solve pays
tracing + compilation, and every subsequent solver *instance* on the same
problem geometry must hit the jit cache (hiop_tpu caches the fused
``jit_mode=iteration`` step per formulation keyed on the option constants,
and jitted helper kernels are global).  This driver times a sequence of
independent solves and prints per-solve wall time — the warm solves are the
sustained multi-instance throughput.

Usage: python examples/hpc_multisolves.py [num_solves] [n_sp] [n_de]
"""

from __future__ import annotations

import os
import sys
import time

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions

from examples.mds_ex1 import MdsEx1


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    num_solves = int(pos[0]) if len(pos) > 0 else 5
    n_sp = int(pos[1]) if len(pos) > 1 else 400
    n_de = int(pos[2]) if len(pos) > 2 else 100

    t_all = time.perf_counter()
    objs = []
    for i in range(num_solves):
        t0 = time.perf_counter()
        o = NlpOptions()
        o.update(
            verbosity_level=0,
            Hessian="analytical_exact",
            duals_update_type="linear",
            duals_init="zero",
            tolerance=1e-5,
            mu0=0.1,
        )
        # fresh problem + formulation + solver instance every time, like the
        # reference's `new MdsEx1(...)` per loop iteration
        nlp = NlpMDS(MdsEx1(n_sp, n_de), o)
        r = FilterIPMNewton(nlp).run()
        dt = time.perf_counter() - t0
        objs.append(float(r.obj))
        print(
            f"[driver] solve {i + 1}/{num_solves}: obj={r.obj:12.5e} "
            f"status={r.status.name} iters={r.iterations} in {dt:.3f} s"
        )
        if not r.status.is_success:
            print("[driver] solve failed")
            return 1
    total = time.perf_counter() - t_all
    print(f"[driver] finished {num_solves} solves in {total:.3f} s "
          f"({total / num_solves:.3f} s/solve average)")
    # all instances solve the identical problem: results must agree bitwise-ish
    if max(objs) - min(objs) > 1e-9 * (1 + abs(objs[0])):
        print("[driver] WARNING: solves disagree", objs)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
