"""Dense Newton KKT systems (XDYcYd / XYcYd) for exact-Hessian solves.

Parity with ``hiopKKTLinSysDenseXYcYd/XDYcYd`` and the compressed-system
algebra (/root/reference/src/Optimization/hiopKKTLinSysDense.hpp:72,227,
hiopKKTLinSys.hpp:292-345). Two factorization paths, mirroring the
reference's quick/safe ladder (linsol_mode, SURVEY.md §5.3):

* **quick** — range-space (Schur) elimination with two Cholesky
  factorizations::

    K = H + Dx + delta_wx*I                       (n x n, PD after regular.)
    S = J K^{-1} J^T + blkdiag(delta_cc*I, (Dd+delta_wd)^{-1} + delta_cd*I)
    S [dyc;dyd] = J K^{-1} rx_t - [ryc; ryd + (Dd+delta_wd)^{-1} rd_t]
    dx = K^{-1}(rx_t - J^T dy);   dd = (Dd+delta_wd)^{-1}(rd_t + dyd)

  Cholesky maps straight onto the MXU (XLA's blocked potrf) and is the
  TPU stand-in for the reference's MAGMA no-pivot LDL^T. A failed factorization
  surfaces as NaNs in the factor -> the caller runs the perturbation loop.

* **safe** — LU with partial pivoting of the full 4-block XDYcYd matrix
  (the stable fallback; the reference uses pivoted LDL^T here). Optional
  inertia count via eigenvalues for fact_acceptor='inertia_correction'
  (expected inertia (n+m_d, m_c+m_d, 0), Ipopt Thm.).

All functions are jitted with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hiop_tpu.linalg.cholesky import cholesky as _chol


class QuickFactors(NamedTuple):
    Lk: jax.Array        # chol(K), (n, n)
    Ls: jax.Array        # chol(S), (m, m)
    Jc: jax.Array
    Jd: jax.Array
    dd_tot: jax.Array    # Dd + delta_wd (m_ineq,)
    dcd: jax.Array       # scalar
    ok_k: jax.Array      # bool: Hessian-block Cholesky finite (else: wrong inertia)
    ok_s: jax.Array      # bool: Schur Cholesky finite (else: singular Jacobian)
    ok: jax.Array        # bool: both


@jax.jit
def factorize_quick(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    K = H + jnp.diag(Dx + delta_wx)
    Lk = _chol(K)
    ok_k = jnp.all(jnp.isfinite(Lk))
    Lk_safe = jnp.where(ok_k, Lk, jnp.eye(n, dtype=K.dtype))

    J = jnp.concatenate([Jc, Jd], axis=0)                     # (m, n)
    KinvJT = jax.scipy.linalg.cho_solve((Lk_safe, True), J.T)  # (n, m)
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)
    S = J @ KinvJT + jnp.diag(
        jnp.concatenate([jnp.full((mc,), delta_cc, K.dtype), dd_inv + delta_cd])
    )
    Ls = _chol(S)
    # guard against a numerically PSD-but-singular Schur complement whose
    # Cholesky happens to succeed: tiny pivots flag singularity too. Once
    # dual regularization is applied (delta_cc > 0) the Schur complement is
    # nonsingular by construction with pivots >= sqrt(delta_cc) — lower the
    # threshold accordingly so the regularized system is accepted.
    diag_s = jnp.diag(Ls)
    scale_s = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(S)), 1e-300)) if mc + md else 1.0
    thresh = jnp.sqrt(jnp.finfo(K.dtype).eps) * scale_s * 1e-2
    dcc = jnp.asarray(delta_cc, K.dtype)
    thresh = jnp.where(dcc > 0, jnp.minimum(thresh, 0.5 * jnp.sqrt(dcc)), thresh)
    tiny_pivot = jnp.min(jnp.abs(diag_s), initial=jnp.inf) < thresh
    ok_s = jnp.all(jnp.isfinite(Ls)) & ~tiny_pivot
    ok = ok_k & ok_s
    Ls_safe = jnp.where(ok, Ls, jnp.eye(mc + md, dtype=K.dtype))
    return QuickFactors(
        Lk_safe, Ls_safe, Jc, Jd, dd_tot, jnp.asarray(delta_cd, K.dtype), ok_k, ok_s, ok
    )


@jax.jit
def solve_quick(f: QuickFactors, rx_t, rd_t, ryc, ryd):
    mc = f.Jc.shape[0]
    J = jnp.concatenate([f.Jc, f.Jd], axis=0)
    dd_inv = jnp.where(f.dd_tot > 0, 1.0 / jnp.maximum(f.dd_tot, 1e-300), 0.0)
    Kinv_rx = jax.scipy.linalg.cho_solve((f.Lk, True), rx_t)
    rhs_y = J @ Kinv_rx - jnp.concatenate([ryc, ryd + dd_inv * rd_t])
    dy = jax.scipy.linalg.cho_solve((f.Ls, True), rhs_y)
    dyc, dyd = dy[:mc], dy[mc:]
    dx = Kinv_rx - jax.scipy.linalg.cho_solve((f.Lk, True), J.T @ dy)
    dd = dd_inv * (dyd + rd_t)
    return dx, dd, dyc, dyd


class SafeFactors(NamedTuple):
    lu: jax.Array
    piv: jax.Array
    n: int
    mc: int
    md: int
    n_neg_eig: jax.Array   # -1 if singular, else count of negative eigenvalues
    ok: jax.Array


def assemble_xdycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    """Full symmetric XDYcYd matrix (doc hiopKKTLinSys.hpp:334-345),
    ordered [x, d, yc, yd]."""
    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    dt = H.dtype
    Z = jnp.zeros
    row_x = jnp.concatenate(
        [H + jnp.diag(Dx + delta_wx), Z((n, md), dt), Jc.T, Jd.T], axis=1
    )
    row_d = jnp.concatenate(
        [Z((md, n), dt), jnp.diag(Dd + delta_wd), Z((md, mc), dt), -jnp.eye(md, dtype=dt)],
        axis=1,
    )
    row_yc = jnp.concatenate(
        [Jc, Z((mc, md), dt), -delta_cc * jnp.eye(mc, dtype=dt), Z((mc, md), dt)], axis=1
    )
    row_yd = jnp.concatenate(
        [Jd, -jnp.eye(md, dtype=dt), Z((md, mc), dt), -delta_cd * jnp.eye(md, dtype=dt)],
        axis=1,
    )
    return jnp.concatenate([row_x, row_d, row_yc, row_yd], axis=0)


@jax.jit
def xdycyd_matvec(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd,
                  dx, dd, dyc, dyd):
    """Apply the compressed XDYcYd operator (same blocks as
    :func:`assemble_xdycyd`) to a direction tuple — used by the FGMRES
    inner iterative refinement of low-precision factorization solves (the
    ReSolve pattern, /root/reference/src/LinAlg/ReSolve)."""
    rx = H @ dx + (Dx + delta_wx) * dx + Jc.T @ dyc + Jd.T @ dyd
    rd = (Dd + delta_wd) * dd - dyd
    ryc = Jc @ dx - delta_cc * dyc
    ryd = Jd @ dx - dd - delta_cd * dyd
    return rx, rd, ryc, ryd


class DeviceLdlFactors(NamedTuple):
    """On-device no-pivot LDL^T factors of the XDYcYd matrix (the TPU
    analogue of hiopLinSolverSymDenseMagmaNopiv,
    hiopLinSolverSymDenseMagma.hpp:145)."""
    ldl: object          # linalg.ldl_blocked.LdlFactors
    n: int
    mc: int
    md: int
    n_neg_eig: jax.Array  # -1 if breakdown/singular, else negative-pivot count
    ok: jax.Array


def factorize_safe_device(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    """Safe-tier factorization that stays on the accelerator: assemble the
    full XDYcYd matrix and run the blocked no-pivot LDL^T
    (linalg/ldl_blocked.py). Inertia comes from the pivot signs (valid by
    Sylvester whenever the factorization does not break down); a breakdown
    reports n_neg_eig=-1, which the perturbation ladder treats like the
    reference treats a MAGMA-Nopiv zero pivot."""
    from hiop_tpu.linalg import ldl_blocked as _ldl

    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    M = assemble_xdycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd)
    f = _ldl.ldl_factor(M)
    n_neg = jnp.where(f.ok, f.n_neg, -1)
    return DeviceLdlFactors(f, n, mc, md, n_neg, f.ok)


def solve_safe_device(f: DeviceLdlFactors, rx_t, rd_t, ryc, ryd):
    from hiop_tpu.linalg import ldl_blocked as _ldl

    rhs = jnp.concatenate([rx_t, rd_t, ryc, ryd])
    sol = _ldl.ldl_solve(f.ldl, rhs)
    n, mc, md = f.n, f.mc, f.md
    dx = sol[:n]
    dd = sol[n:n + md]
    dyc = sol[n + md:n + md + mc]
    dyd = sol[n + md + mc:]
    return dx, dd, dyc, dyd


def assemble_xycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    """Full symmetric XYcYd matrix — the reference's *other* compressed
    linearization (hiopKKTLinSys.hpp:292-301, dense realization
    hiopKKTLinSysDense.hpp:72): the inequality slack d is eliminated too,
    leaving the 3x3 system in (dx, dyc, dyd), ordered [x, yc, yd]::

      [ H + Dx + delta_wx   Jc^T        Jd^T                         ]
      [ Jc                  -delta_cc                                ]
      [ Jd                              -(Dd+delta_wd)^{-1}-delta_cd ]

    Compared to XDYcYd this is smaller (n+mc+md vs n+md+mc+md) but its
    (yd,yd) block carries the *inverse* barrier diagonal — different
    conditioning as mu -> 0, which is exactly why the reference keeps both
    realizations selectable."""
    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    dt = H.dtype
    Z = jnp.zeros
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)
    row_x = jnp.concatenate([H + jnp.diag(Dx + delta_wx), Jc.T, Jd.T], axis=1)
    row_yc = jnp.concatenate(
        [Jc, -delta_cc * jnp.eye(mc, dtype=dt), Z((mc, md), dt)], axis=1
    )
    row_yd = jnp.concatenate(
        [Jd, Z((md, mc), dt), -jnp.diag(dd_inv + delta_cd)], axis=1
    )
    return jnp.concatenate([row_x, row_yc, row_yd], axis=0)


@jax.jit
def xycyd_matvec(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd,
                 dx, dyc, dyd):
    """Apply the compressed XYcYd operator (blocks of
    :func:`assemble_xycyd`) — used by the mixed-precision inner IR."""
    dd_tot = Dd + delta_wd
    dd_inv = jnp.where(dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0)
    rx = H @ dx + (Dx + delta_wx) * dx + Jc.T @ dyc + Jd.T @ dyd
    ryc = Jc @ dx - delta_cc * dyc
    ryd = Jd @ dx - (dd_inv + delta_cd) * dyd
    return rx, ryc, ryd


class XycydSafeFactors(NamedTuple):
    """Host LU + eigen inertia of the assembled XYcYd matrix. Expected
    inertia (n, mc+md, 0) — same negative count as XDYcYd, so the shared
    acceptance test applies unchanged."""
    lu: jax.Array
    piv: jax.Array
    n: int
    mc: int
    md: int
    n_neg_eig: jax.Array
    ok: jax.Array


class XycydDeviceLdlFactors(NamedTuple):
    """On-device no-pivot LDL^T of the XYcYd matrix (MAGMA-Nopiv analogue,
    the reference's XYcYd GPU branch hiopKKTLinSysDense.hpp:100-113)."""
    ldl: object
    n: int
    mc: int
    md: int
    n_neg_eig: jax.Array
    ok: jax.Array


def factorize_xycyd_safe(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    M = assemble_xycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd)
    lu, piv, n_neg_eig = _lu_with_inertia(M, delta_cc)
    import numpy as _np

    ok = jnp.asarray(bool(_np.all(_np.isfinite(lu))))
    return XycydSafeFactors(lu, piv, n, mc, md, n_neg_eig, ok)


def factorize_xycyd_safe_device(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd,
                                delta_cc, delta_cd):
    from hiop_tpu.linalg import ldl_blocked as _ldl

    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    M = assemble_xycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd)
    f = _ldl.ldl_factor(M)
    n_neg = jnp.where(f.ok, f.n_neg, -1)
    return XycydDeviceLdlFactors(f, n, mc, md, n_neg, f.ok)


def solve_xycyd_safe(f, rx_t, ryc, ryd_t):
    """Solve the 3x3 system; returns (dx, dyc, dyd). The caller recovers
    dd = (Dd+delta_wd)^{-1} (rd_t + dyd) (hiopKKTLinSys.cpp:670)."""
    n, mc, md = f.n, f.mc, f.md
    if isinstance(f, XycydDeviceLdlFactors):
        from hiop_tpu.linalg import ldl_blocked as _ldl

        rhs = jnp.concatenate([rx_t, ryc, ryd_t])
        sol = _ldl.ldl_solve(f.ldl, rhs)
    else:
        import numpy as _np
        import scipy.linalg as _sla

        rhs = _np.concatenate(
            [_np.asarray(rx_t), _np.asarray(ryc), _np.asarray(ryd_t)]
        )
        sol = jnp.asarray(_sla.lu_solve((f.lu, f.piv), rhs))
    return sol[:n], sol[n:n + mc], sol[n + mc:]


def _lu_with_inertia(M, delta_cc):
    """Host-side LU + eigen inertia (numpy LAPACK). The safe path is the
    *stable fallback* and deliberately runs on the host: the reference's
    equivalent is MA57/dsytrf on the CPU while the quick path lives on the
    accelerator, and this environment's TPU compiler lacks f64 LU anyway
    (see linalg/small_solve.py)."""
    import numpy as _np
    import scipy.linalg as _sla

    Mh = _np.asarray(M)
    lu, piv = _sla.lu_factor(Mh)
    delta_cc = float(delta_cc)
    w = _np.linalg.eigvalsh(0.5 * (Mh + Mh.T))
    tol = 1e1 * _np.finfo(Mh.dtype).eps * max(float(_np.max(_np.abs(w))), 1.0)
    if delta_cc > 0.0:
        # delta_cc > 0 makes the matrix nonsingular in exact arithmetic, but
        # the dual-regularized eigenvalues sit at -delta_cc, usually BELOW
        # the eig noise floor tol ~ eps*||M|| (with barrier diagonals ~1/mu
        # the floor easily exceeds Ipopt's delta_c ~ 1e-9; an MA57-class
        # solver resolves these from its pivot signs instead). Attribute
        # noise-band eigenvalues to the negative count: if they are the
        # -delta_cc ones the inertia comes out right and the factorization
        # is accepted; if they are a near-singular Hessian block the count
        # exceeds mc+md and the caller bumps delta_w — the right response
        # either way. (Counting them positive made rank-deficient problems
        # bump delta_w forever: MDS Ex2 -rankdefic regression.)
        n_neg_eig = int(_np.sum(w < tol))
    else:
        n_neg = int(_np.sum(w < -tol))
        n_zero = int(_np.sum(_np.abs(w) <= tol))
        n_neg_eig = -1 if n_zero > 0 else n_neg
    return lu, piv, _np.asarray(n_neg_eig)


def factorize_safe(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd):
    n = H.shape[0]
    mc, md = Jc.shape[0], Jd.shape[0]
    M = assemble_xdycyd(H, Dx, Dd, Jc, Jd, delta_wx, delta_wd, delta_cc, delta_cd)
    lu, piv, n_neg_eig = _lu_with_inertia(M, delta_cc)
    import numpy as _np

    ok = jnp.asarray(bool(_np.all(_np.isfinite(lu))))
    return SafeFactors(lu, piv, n, mc, md, n_neg_eig, ok)


def solve_safe(f: SafeFactors, rx_t, rd_t, ryc, ryd):
    # not jitted at this level: the slice sizes (n, mc, md) are Python ints
    # carried in the factors; lu_solve itself dispatches compiled kernels
    import numpy as _np
    import scipy.linalg as _sla

    rhs = _np.concatenate([_np.asarray(rx_t), _np.asarray(rd_t), _np.asarray(ryc), _np.asarray(ryd)])
    sol = jnp.asarray(_sla.lu_solve((f.lu, f.piv), rhs))
    n, mc, md = f.n, f.mc, f.md
    dx = sol[:n]
    dd = sol[n:n + md]
    dyc = sol[n + md:n + md + mc]
    dyd = sol[n + md + mc:]
    return dx, dd, dyc, dyd


@jax.jit
def curvature_test(H, Dx, Dd, delta_wx, delta_wd, dx, dd, neg_curv_test_fact):
    """Inertia-free acceptance (hiopKKTLinSysCompressed::test_direction,
    hiopKKTLinSys.cpp:455): dWd >= fact * ||(dx,dd)||^2 with
    dWd = dx'(H+Dx+delta_wx)dx + dd'(Dd+delta_wd)dd."""
    dWd = dx @ (H @ dx) + dx @ ((Dx + delta_wx) * dx) + dd @ ((Dd + delta_wd) * dd)
    nrmsq = dx @ dx + dd @ dd
    return dWd >= nrmsq * neg_curv_test_fact
