"""Allreduce (psum) microbenchmark over the device mesh.

Parity with the reference's ``hpc_benchmark.cpp``
(/root/reference/src/Drivers/MDS/hpc_benchmark.cpp:34-93): measures
allreduce latency versus buffer size, base 32768 doubles per participant
with a x2 ladder, 8 reduces per size, averaged over repetitions. The MPI
allreduce becomes a psum over the mesh's ICI links (shard_map)."""

from __future__ import annotations

import time
from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def run(
    mesh: Mesh,
    base_count: int = 32768,
    num_sizes: int = 6,
    reduces_per_trial: int = 8,
    reps: int = 20,
    dtype=jnp.float64,
) -> List[Tuple[int, float]]:
    """Returns [(doubles_per_device, seconds_per_allreduce)] per ladder rung."""
    axis = mesh.axis_names[0]
    results = []
    count = base_count
    for _ in range(num_sizes):

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
        )
        def reduce_k(x):
            for _ in range(reduces_per_trial):
                s = jax.lax.psum(x, axis)
                x = x + 1e-30 * s  # keep dependency so nothing is elided
            return x

        x = jax.device_put(
            jnp.ones((count * mesh.devices.size,), dtype),
            NamedSharding(mesh, P(axis)),
        )
        out = reduce_k(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = reduce_k(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * reduces_per_trial)
        results.append((count, dt))
        count *= 2
    return results


def main():
    from hiop_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    print(f"psum microbenchmark over {mesh.devices.size} devices")
    for count, dt in run(mesh):
        gb = count * mesh.devices.size * 8 / 1e9
        print(f"  {count:>9} doubles/dev ({gb:.4f} GB total): {dt*1e6:10.2f} us/allreduce")


if __name__ == "__main__":
    main()
