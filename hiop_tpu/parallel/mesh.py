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


class PaddedDenseProblem:
    """Pad a dense-constrained problem's variable axis to a multiple of the
    mesh size (XLA shardings require even division; the reference's MPI
    column partition has no such constraint, `hiopInterface.hpp:262`, so
    the TPU build masks instead).

    The extra variables are inert: free (no bounds, so no barrier terms),
    zero objective gradient, zero Jacobian columns, zero starting point —
    every search direction component on the pad is exactly zero, and the
    trajectory is bit-identical to the unpadded problem up to reduction
    ordering (asserted by tests/test_sharding.py).
    """

    def __init__(self, inner, n_pad: int):
        n, m = inner.get_prob_sizes()
        assert n_pad >= n
        self.inner = inner
        self.n_orig = n
        self._hiop_pad_n_orig = n  # read by the solver to trim the result
        self.pad = n_pad - n
        self._m = m

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def get_prob_sizes(self):
        return self.n_orig + self.pad, self._m

    def get_vars_info(self):
        from hiop_tpu.interface.base import INF

        xl, xu = self.inner.get_vars_info()
        return (
            np.concatenate([np.asarray(xl), np.full(self.pad, -INF)]),
            np.concatenate([np.asarray(xu), np.full(self.pad, INF)]),
        )

    def get_starting_point(self):
        x0 = np.asarray(self.inner.get_starting_point())
        return np.concatenate([x0, np.zeros(self.pad, x0.dtype)])

    def eval_f(self, x):
        return self.inner.eval_f(x[: self.n_orig])

    def eval_grad_f(self, x):
        import jax.numpy as jnp

        g = jnp.asarray(self.inner.eval_grad_f(x[: self.n_orig]))
        return jnp.concatenate([g, jnp.zeros(self.pad, g.dtype)])

    def eval_cons(self, x):
        return self.inner.eval_cons(x[: self.n_orig])

    def eval_jac_cons(self, x):
        import jax.numpy as jnp

        J = jnp.asarray(self.inner.eval_jac_cons(x[: self.n_orig]))
        return jnp.concatenate(
            [J, jnp.zeros((J.shape[0], self.pad), J.dtype)], axis=1
        )

    def eval_hess_lagr(self, x, obj_factor, lam):
        """Embed the inner Hessian in the top-left block and IDENTITY in the
        pad block: with zero pad gradient/Jacobian the Newton direction on
        the pad is exactly H_pad^{-1}·0 = 0, and the pad block contributes
        no spurious curvature or singularity (an all-zero pad block would
        make the KKT factorization singular and trigger regularization that
        perturbs the real variables' trajectory)."""
        import jax.numpy as jnp

        H = jnp.asarray(
            self.inner.eval_hess_lagr(x[: self.n_orig], obj_factor, lam)
        )
        n_pad = self.n_orig + self.pad
        out = jnp.zeros((n_pad, n_pad), H.dtype)
        out = out.at[: self.n_orig, : self.n_orig].set(H)
        idx = jnp.arange(self.n_orig, n_pad)
        return out.at[idx, idx].set(1.0)


def shard_formulation(nlp, mesh: Mesh, axis_name: str = "n") -> None:
    """Shard an initialized formulation's n-sized data over the mesh.

    After this, the entire solver runs distributed: x-sized iterate leaves
    inherit the sharding through elementwise ops, Jacobian contractions over
    n produce replicated m-sized results via psum, and the small KKT/Schur
    systems stay replicated — the exact layout of the reference's
    hiopVectorPar / hiopMatrixDenseRowMajor / hiopHessianLowRank trio.

    When n is not a multiple of the mesh size and the formulation has not
    been finalized yet, the problem is transparently wrapped in
    :class:`PaddedDenseProblem` (pad-and-mask).
    """
    P_sz = mesh.devices.size
    if not getattr(nlp, "_finalized", False):
        n, _ = nlp.problem.get_prob_sizes()
        if n % P_sz != 0:
            from hiop_tpu.formulation.dense import NlpDenseConstraints

            if not isinstance(nlp, NlpDenseConstraints):
                raise ValueError(
                    f"n={n} not divisible by mesh size {P_sz}; automatic "
                    "pad-and-mask is implemented for NlpDenseConstraints only"
                )
            n_pad = ((n + P_sz - 1) // P_sz) * P_sz
            nlp.problem = PaddedDenseProblem(nlp.problem, n_pad)
    nlp.finalize_initialization()
    if nlp.n % P_sz != 0:
        raise ValueError(
            f"n={nlp.n} must be divisible by the mesh size {P_sz} "
            "(shard before finalize_initialization to get automatic padding)"
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
