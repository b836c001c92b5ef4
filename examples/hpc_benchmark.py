"""Allreduce (psum) microbenchmark driver — the TPU analog of the
reference's MPI_Allreduce network benchmark
(/root/reference/src/Drivers/MDS/hpc_benchmark.cpp:34-93): latency versus
buffer size, base 32768 doubles per participant, x2 ladder, 8 reduces per
trial. The MPI_Allreduce over the interconnect becomes a psum over the
mesh's ICI links (hiop_tpu.parallel.collectives_bench).

Usage: python examples/hpc_benchmark.py [base_count] [num_sizes] [reps]

Runs over all visible devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 HIOP_TPU_PLATFORM=cpu
for a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("-")]
    base = int(pos[0]) if len(pos) > 0 else 32768
    num_sizes = int(pos[1]) if len(pos) > 1 else 6
    reps = int(pos[2]) if len(pos) > 2 else 20

    from hiop_tpu.parallel import collectives_bench
    from hiop_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_dev = mesh.devices.size
    print(f"[driver] psum ladder over {n_dev} device(s), base {base} f64/device")
    print(f"{'doubles/device':>16} {'bytes/device':>14} {'us/allreduce':>14} {'GB/s/device':>12}")
    for count, secs in collectives_bench.run(
        mesh, base_count=base, num_sizes=num_sizes, reps=reps
    ):
        nbytes = count * 8
        bw = nbytes / secs / 1e9 if secs > 0 else float("inf")
        print(f"{count:>16d} {nbytes:>14d} {secs*1e6:>14.2f} {bw:>12.4g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
