"""Distributed compact limited-memory BFGS (Byrd–Nocedal–Schnabel).

Parity with ``hiopHessianLowRank``
(/root/reference/src/Optimization/hiopHessianLowRank.hpp:60-90):

  B = sigma*I - U N^{-1} U^T,   U = [sigma*S, Y] (n x 2l),
  N = [[sigma*S^T S, L], [L^T, -D]],
  L_ij = s_i^T y_j (i > j),  D = diag(s_i^T y_i)

and solves with H = B + Dx (Dx = log-barrier diagonal) via the inverse
representation (doc hpp:75-85):

  H^{-1} = Dh^{-1} - Dh^{-1} U V^{-1} U^T Dh^{-1},
  Dh = sigma + Dx (diagonal),  V = -N + U^T Dh^{-1} U.

TPU-first design: the memory S, Y lives in fixed-size (l_max, n) buffers with
an activity mask so every kernel has static shapes (no recompiles as the
memory fills); inactive V rows/cols are padded with identity. The n-axis may
be sharded over the device mesh: the l x l Gram matrices S S^T, S Dh^{-1} Y^T,
... contract over n, which XLA lowers to psum over ICI — the exact analogue
of the reference's MPI_Allreduce of lxl buffers (hiopHessianLowRank.cpp:459,
590-591). The 2l x 2l V solve is replicated, like the reference's.

The secant update (skip conditions, sigma strategies) follows
hiopHessianLowRank::update (cpp: y = grad_f diff + Jacobian-transpose diffs;
skip when ||s||_inf < 100*eps or s^T y <= ||s|| ||y|| sqrt(eps)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg.small_solve import solve_small


class BfgsState(NamedTuple):
    S: jax.Array        # (l_max, n) rows s_i, chronological (oldest first)
    Y: jax.Array        # (l_max, n) rows y_i
    active: jax.Array   # (l_max,) 0/1 float mask; prefix structure not required
    sigma: jax.Array    # scalar multiple of identity in B0


def init_state(
    n: int, l_max: int, sigma0: float = 1.0, dtype=jnp.float64, mesh=None,
    axis_name: str = "n",
) -> BfgsState:
    """Zero BFGS memory.  With ``mesh`` given, S/Y are created n-axis
    sharded from the start (the reference keeps them MPI column-distributed,
    hiopHessianLowRank.hpp:60); otherwise XLA's propagation from the
    sharded iterate does the same placement one update later."""
    S = jnp.zeros((max(l_max, 1), n), dtype)
    Y = jnp.zeros((max(l_max, 1), n), dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(None, axis_name))
        S, Y = jax.device_put(S, sh), jax.device_put(Y, sh)
    return BfgsState(
        S=S,
        Y=Y,
        active=jnp.zeros((max(l_max, 1),), dtype),
        sigma=jnp.asarray(sigma0, dtype),
    )


_SIGMA_STRATEGIES = ("sigma0", "sty", "sty_inv", "snrm_ynrm", "sty_srnm_ynrm")
_SIGMA_SAFE_MIN, _SIGMA_SAFE_MAX = 1e-8, 1e8


@partial(jax.jit, static_argnames=("strategy",))
def update(
    state: BfgsState,
    s_new: jax.Array,
    y_new: jax.Array,
    sigma0: float,
    strategy: str = "sty",
) -> BfgsState:
    """Secant update with the reference's skip conditions; pure/jittable.

    s_new = x_curr - x_prev;  y_new = grad_Lagr(x_curr, lam_curr) -
    grad_Lagr(x_prev, lam_curr) (caller assembles it; see
    hiopHessianLowRank::update)."""
    eps = jnp.finfo(s_new.dtype).eps
    s_inf = jnp.max(jnp.abs(s_new))
    sty = jnp.dot(s_new, y_new)
    s_nrm = jnp.linalg.norm(s_new)
    y_nrm = jnp.linalg.norm(y_new)

    take = (s_inf >= 100 * eps) & (sty > s_nrm * y_nrm * jnp.sqrt(eps))

    # roll the memory: drop oldest row, append newest
    S2 = jnp.where(take, jnp.roll(state.S, -1, axis=0).at[-1].set(s_new), state.S)
    Y2 = jnp.where(take, jnp.roll(state.Y, -1, axis=0).at[-1].set(y_new), state.Y)
    a2 = jnp.where(take, jnp.roll(state.active, -1).at[-1].set(1.0), state.active)

    if strategy == "sty":
        sig = sty / (s_nrm * s_nrm)
    elif strategy == "sty_inv":
        sig = y_nrm * y_nrm / sty
    elif strategy == "snrm_ynrm":
        sig = jnp.sqrt(s_nrm * s_nrm / (y_nrm * y_nrm))
    elif strategy == "sty_srnm_ynrm":
        sig = 0.5 * (sty / (s_nrm * s_nrm) + y_nrm * y_nrm / sty)
    else:  # "sigma0"
        sig = jnp.asarray(sigma0, s_new.dtype)
    sig = jnp.clip(sig, _SIGMA_SAFE_MIN, _SIGMA_SAFE_MAX)
    sigma2 = jnp.where(take, sig, state.sigma)
    return BfgsState(S2, Y2, a2, sigma2)


def _masked_V_and_U(state: BfgsState, dh_inv: jax.Array):
    """Build U (2l, n) row-major and the padded V (2l, 2l)."""
    S, Y, act, sigma = state.S, state.Y, state.active, state.sigma
    l = S.shape[0]
    # mask inactive rows so they contribute nothing
    Sm = S * act[:, None]
    Ym = Y * act[:, None]
    SY = Sm @ Ym.T                                    # (l, l): s_i^T y_j
    L = jnp.tril(SY, k=-1)
    D = jnp.diag(SY)

    SdS = (Sm * dh_inv) @ Sm.T                        # S Dh^{-1} S^T
    SdY = (Sm * dh_inv) @ Ym.T
    YdY = (Ym * dh_inv) @ Ym.T
    StS = Sm @ Sm.T

    V11 = sigma * sigma * SdS - sigma * StS
    V12 = sigma * SdY - L
    V22 = YdY + jnp.diag(D)
    V = jnp.block([[V11, V12], [V12.T, V22]])
    act2 = jnp.concatenate([act, act])
    V = V * act2[:, None] * act2[None, :] + jnp.diag(1.0 - act2)
    U = jnp.concatenate([sigma * Sm, Ym], axis=0)     # (2l, n)
    return U, V, act2


@jax.jit
def solve(state: BfgsState, Dx: jax.Array, rhs: jax.Array) -> jax.Array:
    """(B + diag(Dx))^{-1} rhs for rhs of shape (n,) or (n, k)
    (hiopHessianLowRank::solve / symMatTimesInverseTimesMatTrans)."""
    dh_inv = 1.0 / (state.sigma + Dx)                 # (n,)
    U, V, act2 = _masked_V_and_U(state, dh_inv)
    single = rhs.ndim == 1
    R = rhs[:, None] if single else rhs               # (n, k)
    DR = dh_inv[:, None] * R
    t = U @ DR                                        # (2l, k) — n-contraction (psum)
    w = solve_small(V, t) * act2[:, None]
    out = DR - dh_inv[:, None] * (U.T @ w)
    return out[:, 0] if single else out


@jax.jit
def times_vec(state: BfgsState, x: jax.Array) -> jax.Array:
    """B @ x via the compact form (timesVec; used by curvature tests)."""
    S, Y, act, sigma = state.S, state.Y, state.active, state.sigma
    Sm = S * act[:, None]
    Ym = Y * act[:, None]
    SY = Sm @ Ym.T
    L = jnp.tril(SY, k=-1)
    D = jnp.diag(SY)
    N11 = sigma * (Sm @ Sm.T)
    N = jnp.block([[N11, L], [L.T, -jnp.diag(D)]])
    act2 = jnp.concatenate([act, act])
    N = N * act2[:, None] * act2[None, :] + jnp.diag(1.0 - act2)
    U = jnp.concatenate([sigma * Sm, Ym], axis=0)
    t = U @ x
    w = solve_small(N, t) * act2
    return sigma * x - U.T @ w
