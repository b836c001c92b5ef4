"""Pattern-aware vector kernels.

Functional equivalents of the reference's ``hiopVector`` virtuals
(/root/reference/src/LinAlg/hiopVector.hpp:62 and the CUDA kernels in
VectorCudaKernels.cu): log-barrier terms, linear damping, fraction-to-the-
boundary, dual adjustment, bound projection. A "pattern" is a 0/1 float array
selecting entries with a finite bound; non-selected slack entries are kept at
1.0 and dual entries at 0.0 so that every kernel is branch-free elementwise
math — the form XLA fuses best. Under sharding, reductions (`min`, `sum`)
lower to psum/pmin collectives over the mesh, replacing the reference's
MPI_Allreduce (hiopVectorPar.cpp:474-1303).

All functions are pure and jit-safe; shapes are static.
"""

from __future__ import annotations

import jax.numpy as jnp


def logbar_sum(s, pattern):
    """sum(log(s_i)) over pattern (hiopVectorPar::logBarrier_local)."""
    safe = jnp.where(pattern == 1.0, s, 1.0)
    return jnp.sum(jnp.where(pattern == 1.0, jnp.log(safe), 0.0))


def add_logbar_grad(grad, alpha, s, pattern):
    """grad += alpha / s on pattern (hiopVectorPar::addLogBarrierGrad)."""
    safe = jnp.where(pattern == 1.0, s, 1.0)
    return grad + jnp.where(pattern == 1.0, alpha / safe, 0.0)


def linear_damping_term(s, pat_left, pat_right, mu, kappa_d):
    """kappa_d*mu*sum(s_i : left-bounded only) (linearDampingTerm_local)."""
    sel = (pat_left == 1.0) & (pat_right == 0.0)
    return kappa_d * mu * jnp.sum(jnp.where(sel, s, 0.0))


def add_linear_damping_grad(grad, pat_left, pat_right, ct):
    """grad += (pat_left - pat_right) * ct (addLinearDampingTerm)."""
    return grad + (pat_left - pat_right) * ct


def fraction_to_the_boundary(s, ds, tau, pattern=None):
    """max alpha in (0,1] with s + alpha*ds >= (1-tau)*s, elementwise over
    pattern (fractionToTheBdry_local). Under sharding the final min is a
    pmin over the mesh."""
    neg = ds < 0
    if pattern is not None:
        neg = neg & (pattern == 1.0)
    ratios = jnp.where(neg, -tau * s / jnp.where(neg, ds, -1.0), 1.0)
    return jnp.minimum(1.0, jnp.min(ratios, initial=1.0))


def adjust_duals_plh(z, s, pattern, mu, kappa_sigma):
    """Clamp duals into [mu/(kappa*s), kappa*mu/s] (adjustDuals_plh,
    Ipopt eq. (16) 'primal-log-Hessian' safeguard)."""
    safe_s = jnp.where(pattern == 1.0, s, 1.0)
    lo = mu / (kappa_sigma * safe_s)
    hi = kappa_sigma * mu / safe_s
    return jnp.where(pattern == 1.0, jnp.clip(z, lo, hi), 0.0)


def project_into_bounds(x, xl, ixl, xu, ixu, kappa1, kappa2):
    """Push x strictly inside its bounds (hiopVector::projectIntoBounds,
    used by startingProcedure, hiopAlgFilterIPM.cpp:290): for two-sided
    bounds use relative shifts kappa2*(xu-xl) capped by kappa1-scaled
    absolute shifts; for one-sided use kappa1 shifts."""
    both = (ixl == 1.0) & (ixu == 1.0)
    lower_only = (ixl == 1.0) & (ixu == 0.0)
    upper_only = (ixl == 0.0) & (ixu == 1.0)

    pl = jnp.minimum(kappa1 * jnp.maximum(1.0, jnp.abs(xl)), kappa2 * (xu - xl))
    pu = jnp.minimum(kappa1 * jnp.maximum(1.0, jnp.abs(xu)), kappa2 * (xu - xl))

    x_both = jnp.clip(x, xl + pl, xu - pu)
    x_low = jnp.maximum(x, xl + kappa1 * jnp.maximum(1.0, jnp.abs(xl)))
    x_upp = jnp.minimum(x, xu - kappa1 * jnp.maximum(1.0, jnp.abs(xu)))

    out = jnp.where(both, x_both, x)
    out = jnp.where(lower_only, x_low, out)
    out = jnp.where(upper_only, x_upp, out)
    return out


def slack_lower(x, xl, ixl):
    """sxl = x - xl on pattern, else 1.0."""
    return jnp.where(ixl == 1.0, x - xl, 1.0)


def slack_upper(x, xu, ixu):
    """sxu = xu - x on pattern, else 1.0."""
    return jnp.where(ixu == 1.0, xu - x, 1.0)


def adjust_small_slacks(slack, bound, slack_dual, pattern, mu):
    """Push numerically tiny slacks away from zero
    (hiopIterate::adjust_small_slacks, hiopIterate.cpp:414): where
    slack < eps*min(1,mu), set
      new_slack = min( max(mu/slack_dual, small_val),
                       max(slack,0) + eps^0.75 * max(1,|bound|) ).
    Returns (new_slack, num_adjusted)."""
    eps = jnp.finfo(slack.dtype).eps
    small_val = eps * jnp.minimum(1.0, mu)
    scale_fact = eps**0.75
    sel = pattern == 1.0
    tiny = sel & (slack < small_val)
    s0 = jnp.maximum(slack, 0.0)
    safe_dual = jnp.where(jnp.abs(slack_dual) > 0, slack_dual, 1.0)
    cand = jnp.maximum(mu / safe_dual, small_val)
    cap = s0 + scale_fact * jnp.maximum(1.0, jnp.abs(jnp.where(sel, bound, 0.0)))
    new_slack = jnp.where(tiny, jnp.minimum(cand, cap), slack)
    return new_slack, jnp.sum(tiny)


def infnorm(v):
    return jnp.max(jnp.abs(v)) if v.size else jnp.asarray(0.0, v.dtype)


def infnorm_w_pattern(v, pattern):
    return jnp.max(jnp.abs(v) * (pattern == 1.0), initial=0.0)


def onenorm(v):
    return jnp.sum(jnp.abs(v))


def num_finite(bound, is_low: bool):
    """Count finite bounds (|b| < 1e20), mirroring process_bounds counts."""
    return int(jnp.sum(jnp.abs(bound) < 1e20))
