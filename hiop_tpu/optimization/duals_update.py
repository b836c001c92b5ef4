"""Constraint-multiplier updates (LSQ and linear).

Parity with ``hiopDualsUpdater`` (/root/reference/src/Optimization/
hiopDualsUpdater.hpp:68,116,254,401). The LSQ update solves

  [ Jc Jc^T    Jc Jd^T     ] [yc]   [Jc  0] [ -grad_f + zl - zu ]
  [ Jd Jc^T    Jd Jd^T + I ] [yd] = [Jd  I] [ -vl + vu          ]

(doc hiopDualsUpdater.hpp:199-231). The m x m system is replicated and
Cholesky-solved; the Jacobian products contract over the (possibly sharded)
n axis — the reference allreduces the same small matrix
(hiopDualsUpdater.cpp:251)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def lsq_duals(Jc, Jd, grad_f, zl, zu, vl, vu):
    """Returns (yc, yd) minimizing the dual-infeasibility LSQ problem."""
    mc, md = Jc.shape[0], Jd.shape[0]
    m = mc + md
    if m == 0:
        return jnp.zeros((0,), grad_f.dtype), jnp.zeros((0,), grad_f.dtype)
    J = jnp.concatenate([Jc, Jd], axis=0)
    M = J @ J.T + jnp.diag(
        jnp.concatenate([jnp.zeros((mc,), J.dtype), jnp.ones((md,), J.dtype)])
    )
    r1 = -grad_f + zl - zu
    r2 = -vl + vu
    rhs = J @ r1 + jnp.concatenate([jnp.zeros((mc,), J.dtype), r2])
    # SPD up to Jacobian rank deficiency; regularized Cholesky
    eps = jnp.finfo(M.dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(M)), 1.0)
    L = jnp.linalg.cholesky(M + jnp.sqrt(eps) * scale * jnp.eye(m, dtype=M.dtype))
    y = jax.scipy.linalg.cho_solve((L, True), rhs)
    return y[:mc], y[mc:]


def lsq_duals_matfree(Jc, Jd, grad_f, zl, zu, vl, vu, tol=1e-10, maxit=200):
    """LSQ duals via CG on the normal equations with Jacobian matvec
    handles (TripletMatrix) — the reference's sparse augmented LSQ
    realization (hiopDualsLsqUpdateLinsysAugSparse, hpp:357) without ever
    forming J J^T."""
    from hiop_tpu.linalg import krylov

    mc, md = Jc.shape[0], Jd.shape[0]
    if mc + md == 0:
        z = jnp.zeros((0,), jnp.float64)
        return z, z
    r1 = -grad_f + zl - zu
    r2 = -vl + vu

    def matvec(y):
        yc, yd = y[:mc], y[mc:]
        v = (Jc.T @ yc if mc else 0.0) + (Jd.T @ yd if md else 0.0)
        top = Jc @ v if mc else jnp.zeros((0,), grad_f.dtype)
        bot = (Jd @ v if md else jnp.zeros((0,), grad_f.dtype)) + yd
        return jnp.concatenate([top, bot])

    rhs = jnp.concatenate(
        [
            Jc @ r1 if mc else jnp.zeros((0,), grad_f.dtype),
            (Jd @ r1 if md else jnp.zeros((0,), grad_f.dtype)) + r2,
        ]
    )
    y, info = krylov.pcg(matvec, rhs, tol=tol, maxit=maxit)
    return y[:mc], y[mc:]


def initial_duals_lsq(Jc, Jd, grad_f, zl, zu, vl, vu, lsq_max: float):
    """LSQ initialization with the duals_lsq_ini_max cap
    (compute_initial_duals_eq): falls back to zeros when the LSQ duals are
    large (badly scaled problems). Dispatches to the matvec-based CG
    realization for matrix-free Jacobian handles."""
    if hasattr(Jc, "vals") or hasattr(Jd, "vals"):
        yc, yd = lsq_duals_matfree(Jc, Jd, grad_f, zl, zu, vl, vu)
    elif (Jc.shape[0] + Jd.shape[0]) * Jc.shape[1] > 50_000_000:
        # forming J J^T for a huge dense Jacobian OOMs long before the
        # solver proper would (measured: B=2048 ACOPF, J 18432 x 20889 f64,
        # needs 34.8 GB vs 15.75 GB HBM through the emulated-f64 matmul;
        # even matvec-only CG needs 17.3 GB from the hi/lo-split f64
        # emulation copies). Run the CG in f32 — this is an INITIALIZATION
        # whose result is magnitude-capped below anyway; ~1e-6 duals
        # accuracy is plenty.
        f32 = jnp.float32
        yc, yd = lsq_duals_matfree(
            Jc.astype(f32), Jd.astype(f32), grad_f.astype(f32),
            zl.astype(f32), zu.astype(f32), vl.astype(f32), vu.astype(f32),
            tol=1e-6,
        )
        yc = yc.astype(grad_f.dtype)
        yd = yd.astype(grad_f.dtype)
    else:
        yc, yd = lsq_duals(Jc, Jd, grad_f, zl, zu, vl, vu)
    ynrm = max(
        float(jnp.max(jnp.abs(yc))) if yc.size else 0.0,
        float(jnp.max(jnp.abs(yd))) if yd.size else 0.0,
    )
    if ynrm > lsq_max:
        return jnp.zeros_like(yc), jnp.zeros_like(yd)
    return yc, yd
