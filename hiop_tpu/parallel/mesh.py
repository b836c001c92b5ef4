"""Device-mesh placement for the distributed solver.

Parity with the reference's MPI data distribution (SURVEY.md §2.9): the
variable axis n of x, bounds, Jacobian columns, and BFGS memory is
partitioned across ranks; every global reduction (dot, norms, min,
fraction-to-the-boundary) is an allreduce. Here the partition is a
``jax.sharding.NamedSharding`` over a 1-D mesh axis ``"n"`` and the
reductions lower to psum/pmin over ICI automatically — no explicit
communication code exists anywhere in the solver, which is the whole point
of the design (compare hiopVectorPar.cpp:474-1303's 15 hand-written
MPI_Allreduce call sites).

Multi-host: build the mesh over ``jax.devices()`` after
``jax.distributed.initialize``; the same code paths apply.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "n") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


def _put(a, sharding):
    """Place replicated host data under ``sharding``.  In a multi-process
    job the mesh spans non-addressable devices and ``jax.device_put``
    refuses host data; every process holds the full (identical) host
    value, so building the global array from per-shard callbacks is
    exact (the hiopVectorPar 'local slice of a replicated source' ctor)."""
    if sharding.is_fully_addressable:
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def shard_n(mesh: Mesh, a, axis_name: str = "n"):
    """Place a vector (n,) or matrix (..., n) with its last axis sharded."""
    spec = P(*([None] * (a.ndim - 1) + [axis_name]))
    return _put(a, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, a):
    return _put(a, NamedSharding(mesh, P()))


def to_host(a) -> np.ndarray:
    """``np.asarray`` that also works for arrays whose shards live on other
    processes (multi-process meshes): falls back to a tiled allgather — the
    'fetch the global vector on every rank' idiom the reference expresses
    with MPI_Allgatherv."""
    try:
        return np.asarray(a)
    except RuntimeError:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def shard_formulation(nlp, mesh: Mesh, axis_name: str = "n") -> None:
    """Shard an initialized formulation's n-sized data over the mesh.

    After this, the entire solver runs distributed: x-sized iterate leaves
    inherit the sharding through elementwise ops, Jacobian contractions over
    n produce replicated m-sized results via psum, and the small KKT/Schur
    systems stay replicated — the exact layout of the reference's
    hiopVectorPar / hiopMatrixDenseRowMajor / hiopHessianLowRank trio.
    """
    nlp.finalize_initialization()
    if nlp.n % mesh.devices.size != 0:
        raise ValueError(
            f"n={nlp.n} must be divisible by the mesh size {mesh.devices.size} "
            "(pad the problem or choose a different mesh)"
        )
    b = nlp.bounds
    nlp.bounds = b._replace(
        xl=shard_n(mesh, b.xl, axis_name),
        xu=shard_n(mesh, b.xu, axis_name),
        ixl=shard_n(mesh, b.ixl, axis_name),
        ixu=shard_n(mesh, b.ixu, axis_name),
        dl=replicate(mesh, b.dl),
        du=replicate(mesh, b.du),
        idl=replicate(mesh, b.idl),
        idu=replicate(mesh, b.idu),
    )
    nlp._mesh = mesh
    nlp._mesh_axis = axis_name
    # wrap get_starting_point so the primal iterate starts sharded
    orig_start = nlp.get_starting_point

    def sharded_start():
        return shard_n(mesh, orig_start(), axis_name)

    nlp.get_starting_point = sharded_start
