"""Filter line-search interior-point solvers.

Parity with ``hiopAlgFilterIPMBase`` / ``hiopAlgFilterIPMQuasiNewton`` /
``hiopAlgFilterIPMNewton`` (/root/reference/src/Optimization/
hiopAlgFilterIPM.hpp:83,349,446). The outer algorithm (mu loop, filter
line search, second-order correction, dual updates, termination) runs in
Python at iteration granularity — it is O(100) decisions per solve — while
all O(n)/O(n*m) math (residual assembly, KKT solves, fraction-to-the-
boundary, BFGS/Hessian algebra) runs as jit-compiled functions on device,
the same split the reference has between its control flow and its
BLAS/device kernels (see SURVEY.md §3.1 hot-loop analysis).

The main loop is shared between the quasi-Newton and Newton solvers through
a search-direction *strategy* object (the reference reaches the same reuse
through virtual dispatch on the KKT class hierarchy):

* :class:`_LowRankStrategy` — limited-memory BFGS + low-rank Schur KKT
  (hiopKKTLinSysLowRank); no regularization (PDPerturbationNull).
* :class:`_NewtonDenseStrategy` — exact Hessian, dense XDYcYd KKT with the
  quick (Cholesky-Schur) / safe (LU) factorization ladder, the
  inertia-correction / inertia-free acceptance loop, and Ipopt-style
  primal-dual regularization (compute_search_direction[_inertia_free],
  hiopAlgFilterIPM.cpp:3335,3374).

Algorithm skeleton mirrors the reference's run() (cpp:955-1552 for QN):
startingProcedure -> loop { errors/termination -> mu update loop ->
Hessian/KKT update -> search direction -> fraction-to-boundary ->
backtracking filter line search (with SOC) -> dual update -> re-evals }.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from hiop_tpu.interface.base import IterateCallbackInfo
from hiop_tpu.formulation.base import NlpFormulation
from hiop_tpu.kkt import condensed as kkt_cond
from hiop_tpu.kkt import full_space as kkt_full
from hiop_tpu.kkt import lowrank as kkt_lowrank
from hiop_tpu.kkt import newton_dense as kkt_nd
from hiop_tpu.kkt import normal_eqn as kkt_ne
from hiop_tpu.linalg import krylov
from hiop_tpu.optimization import duals_update as du
from hiop_tpu.optimization import hessian_lowrank as blr
from hiop_tpu.optimization import iterate as it_mod
from hiop_tpu.optimization import residual as res_mod
from hiop_tpu.optimization.filter import Filter
from hiop_tpu.optimization.iterate import Bounds, Iterate
from hiop_tpu.optimization.perturbation import make_perturbation
from hiop_tpu.status import SolveStatus
from hiop_tpu.utils.logger import Verbosity


@dataclass
class SolverResult:
    status: SolveStatus
    x: np.ndarray
    obj: float
    iterations: int
    err_nlp: float = float("nan")
    mu: float = float("nan")


class _UserEvalError(Exception):
    pass


class _StepComputationError(Exception):
    pass


class _FusedFallback(Exception):
    """Raised by the fused fast path when an iteration needs machinery that
    lives only in the general loop (regularization, SOC, FR)."""


# =====================================================================
# search-direction strategies
# =====================================================================
class _LowRankStrategy:
    """Quasi-Newton: compact BFGS + low-rank Schur KKT."""

    def __init__(self, nlp: NlpFormulation):
        o = nlp.options
        self.nlp = nlp
        self.bfgs = blr.init_state(
            nlp.n, o.integer("secant_memory_len"), o.num("sigma0"),
            mesh=getattr(nlp, "_mesh", None),
            axis_name=getattr(nlp, "_mesh_axis", "n"),
        )
        self.sigma_strategy = o.str_("sigma_update_strategy")
        self.sigma0 = o.num("sigma0")
        self.prev = None
        self.kdata = None

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        if self.prev is not None:
            x_prev, grad_prev, Jc_prev, Jd_prev = self.prev
            s_new = it.x - x_prev
            y_new = (grad_f - grad_prev)
            if Jc.shape[0]:
                y_new = y_new + (Jc - Jc_prev).T @ it.yc
            if Jd.shape[0]:
                y_new = y_new + (Jd - Jd_prev).T @ it.yd
            self.bfgs = blr.update(self.bfgs, s_new, y_new, self.sigma0, strategy=self.sigma_strategy)
        self.prev = (it.x, grad_f, Jc, Jd)
        Dx, Dd = res_mod.barrier_diagonals(it, b)
        self.kdata = kkt_lowrank.LowRankKKTData(self.bfgs, Dx, Dd, Jc, Jd)

    def compute_direction(self, resid, it: Iterate, b: Bounds) -> Tuple[Iterate, bool]:
        return self.solve_rhs(resid, it, b), True

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        dx, dd, dyc, dyd = kkt_lowrank.solve_compressed(self.kdata, rx_t, rd_t, ryc, ryd)
        return res_mod.recover_direction(resid, it, b, dx, dd, dyc, dyd)


def _maybe_escalate_chronic(strategy, can_escalate: bool) -> None:
    """Escalate a KKT strategy to its next safe tier when the current tier
    only passes its acceptance checks with a persistent primal
    regularization.

    The quick Cholesky-based tiers (dense Cholesky-Schur, MDS
    diag-elimination + Cholesky) require the FULL-space Hessian block
    H + Dx + delta_w I to be positive definite — a strictly stronger
    condition than the correct inertia criterion (reduced Hessian PD on the
    constraint nullspace, hiopKKTLinSys.hpp:204). On structurally
    indefinite problems (e.g. the ACOPF-class driver, whose bilinear
    power-balance auxiliaries carry +/-lambda/2 diagonal curvature) a quick
    tier then 'succeeds' with delta_w = O(1) at EVERY iteration, turning
    Newton into a damped-gradient creep (measured: 1074 vs 57 IPM
    iterations on examples/acopf_mds.py). An inertia-revealing safe tier
    accepts delta_w ~ 0 whenever the true reduced Hessian is PD, so chronic
    regularization is the escalation signal — this extends the reference's
    switch_to_safer_KKT trigger (hiopAlgFilterIPM.hpp:468), which only
    fires on outright factorization failure. Called at the top of each
    iteration's prepare(), while the previous iteration's deltas are still
    live."""
    if strategy.perturb.delta_wx > 0.0:
        strategy._chronic_delta += 1
    else:
        strategy._chronic_delta = 0
    if (
        strategy._chronic_delta >= 4
        and can_escalate
        and strategy._safe_mode < len(strategy._safe_tiers)
        and strategy.linsol_mode != "forcequick"
    ):
        strategy._safe_mode += 1
        strategy._chronic_delta = 0
        strategy.log.printf(
            Verbosity.SCALARS,
            "KKT: chronic regularization (delta_w=%.2e for 4 iters); "
            "switching to inertia-revealing safe mode (%s)",
            strategy.perturb.delta_wx,
            strategy._safe_tiers[strategy._safe_mode - 1],
        )


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(13,))
def _mds_matvec_jit(hss, Dxs, Dxd, Dd, Hdd, Jc_s, Jc_d, Jd_s, Jd_d,
                    dwx, dwd, dcc, dcd, ns, dx, dd, dyc, dyd):
    dxs, dxd = dx[:ns], dx[ns:]
    ax_s = (hss + Dxs + dwx) * dxs + Jc_s.T @ dyc + Jd_s.T @ dyd
    ax_d = Hdd @ dxd + (Dxd + dwx) * dxd + Jc_d.T @ dyc + Jd_d.T @ dyd
    ad = (Dd + dwd) * dd - dyd
    ayc = Jc_s @ dxs + Jc_d @ dxd - dcc * dyc
    ayd = Jd_s @ dxs + Jd_d @ dxd - dd - dcd * dyd
    return jnp.concatenate([ax_s, ax_d]), ad, ayc, ayd


def _mp_init(strategy, o) -> None:
    """Attach the mixed-precision schedule state (VERDICT r2 #8: the fixed
    mu >= 1e-4 cutover replaced by an IR-residual-driven policy)."""
    strategy._mp_schedule = o.str_("mp_schedule")
    strategy._mp_mu_threshold = o.num("mp_mu_threshold")
    strategy._mp_f32_ok = True
    strategy._deesc_n = o.integer("mp_deescalate_iters")
    strategy._deesc_clean = 0
    strategy._deesc_budget = 2  # flip-flop guard: at most 2 per solve


def _mp_fact_dtype(strategy):
    """Effective factorization dtype.  f64 always in safe mode (its
    inertia-revealing factorizations meet genuinely indefinite saddles
    where f32 pivots break down); otherwise 'adaptive' stays f32 until the
    f64 refinement residual stops certifying the solve, 'mu_threshold' uses
    the fixed cutover — cf. ReSolve/IterativeRefinement.hpp:25 made
    adaptive."""
    if strategy._fact_dtype_opt == jnp.float64:
        return jnp.float64
    if strategy._safe_mode:
        # ReSolve-pattern device re-entry: an f32 on-device safe-tier
        # factorization certified by the f64 residual / inner IR, instead
        # of emulated-f64-on-device or a host round-trip; demoted on the
        # first rejection or failed certification
        probe = getattr(strategy, "_mp_safe_f32_device", None)
        if (
            strategy._mp_schedule == "adaptive"
            and strategy._mp_f32_ok
            and probe is not None
            and probe()
        ):
            return jnp.float32
        return jnp.float64
    if strategy._mp_schedule == "mu_threshold":
        return (
            jnp.float32
            if strategy._mu >= strategy._mp_mu_threshold
            else jnp.float64
        )
    return jnp.float32 if strategy._mp_f32_ok else jnp.float64


def _mp_demote(strategy, why: str) -> None:
    if strategy._mp_f32_ok:
        strategy._mp_f32_ok = False
        strategy.log.printf(
            Verbosity.SCALARS,
            "mixed precision: demoting KKT factorization to f64 (%s)", why,
        )


def _mp_count_fact(strategy) -> None:
    k = strategy.stats.kkt
    k.n_fact_total += 1
    if strategy.fact_dtype == jnp.float32:
        k.n_fact_f32 += 1


def _maybe_deescalate_safe(strategy) -> None:
    """switch_to_fast_KKT analogue (hiopAlgFilterIPM.hpp:468): after N
    consecutive clean safe-mode iterations (zero regularization, zero
    corrections) step back one tier toward the quick path and give f32
    another chance (the VERDICT r2 #8 're-enter f32 after safe-mode
    recovery').  Called from prepare() while the previous iteration's
    deltas are live, like _maybe_escalate_chronic."""
    if not strategy._safe_mode or strategy._deesc_budget <= 0:
        strategy._deesc_clean = 0
        return
    # 'clean' = the previous iteration factorized on the first try with NO
    # regularization of any kind: primal (delta_wx), dual/singularity
    # (delta_cc), or correction retries (ADVICE r3: delta_cc-only bumps and
    # MAX_REFACT corrections must also reset the streak)
    kkt_stats = getattr(getattr(strategy, "stats", None), "kkt", None)
    clean = (
        strategy.perturb.delta_wx == 0.0
        and getattr(strategy.perturb, "delta_cc", 0.0) == 0.0
        and getattr(kkt_stats, "n_update_corrections_prev", 0) == 0
    )
    strategy._deesc_clean = strategy._deesc_clean + 1 if clean else 0
    if strategy._deesc_clean >= strategy._deesc_n:
        strategy._safe_mode -= 1
        strategy._deesc_clean = 0
        strategy._deesc_budget -= 1
        strategy._chronic_delta = 0
        if getattr(strategy, "_mp_schedule", "") == "adaptive":
            strategy._mp_f32_ok = True
        strategy.log.printf(
            Verbosity.SCALARS,
            "KKT: %d clean safe-mode iterations; de-escalating to %s",
            strategy._deesc_n,
            "quick tier"
            if strategy._safe_mode == 0
            else strategy._safe_tiers[strategy._safe_mode - 1],
        )


def _dense_safe_tiers(o) -> tuple:
    """Safe-mode escalation ladder for dense symmetric-indefinite KKT
    factorizations, from the linear_solver_dense option: the on-device
    no-pivot LDL^T (MAGMA-Nopiv analogue) before the host LU + eigen
    inertia (LAPACK analogue); 'auto' skips the device tier on CPU where
    scipy's pivoted LU is both faster and stabler."""
    from hiop_tpu.backends.execspace import on_accelerator

    dense_solver = o.str_("linear_solver_dense")
    if dense_solver == "auto":
        return ("ldl_nopiv", "lu_eig") if on_accelerator() else ("lu_eig",)
    if dense_solver == "ldl_nopiv":
        return ("ldl_nopiv",)
    return ("lu_eig",)


class _NewtonDenseStrategy:
    """Exact Hessian with dense XDYcYd KKT and the quick/safe ladder.

    The factorize -> acceptance-test -> regularize loop mirrors
    factorizeWithCurvCheck + compute_search_direction[_inertia_free]
    (hiopKKTLinSys.hpp:204, hiopAlgFilterIPM.cpp:3335,3374); max 10
    refactorizations per direction as in the reference."""

    MAX_REFACT = 10

    def __init__(self, nlp: NlpFormulation, logger, stats):
        o = nlp.options
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(o, for_newton=True)
        self.inertia_free = o.str_("fact_acceptor") == "inertia_free"
        self.neg_curv_fact = o.num("neg_curv_test_fact")
        self.linsol_mode = o.str_("linsol_mode")
        # KKT class selection (decideAndCreateLinearSystem, cpp:1848-1901):
        # 'condensed' needs an inequality-only NLP (the formulation relaxed
        # equalities), 'normaleqn' a diagonal Hessian; both force the
        # inertia-free acceptor since their Cholesky has no inertia info.
        self.kkt_kind = o.str_("KKTLinsys")
        if self.kkt_kind == "auto":
            self.kkt_kind = "xdycyd"
        if self.kkt_kind == "condensed" and nlp.m_eq > 0:
            raise ValueError("condensed KKT requires an inequality-only NLP")
        # condensed/normaleqn Cholesky and the nonsymmetric LU of the full
        # unreduced system carry no inertia information -> curvature acceptor
        # (same constraint as the reference's PARDISO-nonsym full branch)
        if self.kkt_kind in ("condensed", "normaleqn", "full"):
            self.inertia_free = True
        self.ir_maxit = o.integer("ir_outer_maxit")
        self.ir_tol_factor = o.num("ir_outer_tol_factor")
        self.ir_tol_min = o.num("ir_outer_tol_min")
        # mixed precision (ReSolve pattern): factorize in f32 on the MXU,
        # refine the direction in f64 via the outer IR
        self._fact_dtype_opt = (
            jnp.float32 if o.str_("kkt_fact_dtype") == "float32" else jnp.float64
        )
        self._H = None
        self._Dx = self._Dd = None
        self._Jc = self._Jd = None
        self._mu = 1.0
        self._factors = None
        # The quick Cholesky-Schur factorization with the regularization
        # ladder + curvature safeguards is this framework's *stable* primary
        # solver (it is an exact factorization; the reference's 'stable'
        # means MA57-class). When quick fails, switch_to_safer_KKT escalates
        # through the safe tiers (unless linsol_mode='forcequick'):
        # on-device no-pivot LDL^T (the MAGMA-Nopiv analogue,
        # kkt/newton_dense.py::factorize_safe_device) first, host LU+eigen
        # last — mirroring the reference's GPU->CPU solver ladder. The
        # linear_solver_dense option pins a single tier.
        self._safe_mode = 0  # index into (quick,) + _safe_tiers
        self._safe_tiers = _dense_safe_tiers(o)
        self._chronic_delta = 0
        _mp_init(self, o)

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        _maybe_deescalate_safe(self)
        _maybe_escalate_chronic(self, self.kkt_kind in ("xdycyd", "xycyd"))
        with self.stats.kkt.tm_update_init:
            self._H = self.nlp.eval_hess(it.x, 1.0, it.yc, it.yd)
            self._Dx, self._Dd = res_mod.barrier_diagonals(it, b)
            self._Jc, self._Jd = Jc, Jd
        self._itb = (it, b)
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)
        self._factors = None

    # -- factorization ----------------------------------------------------
    @property
    def fact_dtype(self):
        """Effective factorization dtype — see :func:`_mp_fact_dtype` (the
        mp_schedule option: IR-residual-driven by default; safe mode always
        f64, cf. hiopAlgFilterIPM.cpp:3335)."""
        return _mp_fact_dtype(self)

    def _cast(self, a):
        return a.astype(self.fact_dtype) if a.dtype != self.fact_dtype else a

    def _factorize(self):
        p = self.perturb
        _mp_count_fact(self)
        if self.fact_dtype != jnp.float64:
            H, Dx, Dd = self._cast(self._H), self._cast(self._Dx), self._cast(self._Dd)
            Jc, Jd = self._cast(self._Jc), self._cast(self._Jd)
        else:
            H, Dx, Dd, Jc, Jd = self._H, self._Dx, self._Dd, self._Jc, self._Jd
        with self.stats.kkt.tm_update_fact:
            if self.kkt_kind == "full":
                it_k, b_k = self._itb
                return kkt_full.factorize_full(
                    self._H, self._Jc, self._Jd, it_k, b_k,
                    (p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd),
                )
            if self.kkt_kind == "condensed":
                return kkt_cond.factorize(
                    H, Dx, Dd, Jd, p.delta_wx, p.delta_wd, p.delta_cd
                )
            if self.kkt_kind == "normaleqn":
                return kkt_ne.factorize(
                    jnp.diag(H), Dx, Dd, Jc, Jd,
                    p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
                )
            if self._safe_mode:
                tier = self._safe_tiers[self._safe_mode - 1]
                if self.kkt_kind == "xycyd":
                    # the distinct 3x3 XYcYd realization: d eliminated via
                    # the (Dd+delta_wd)^{-1} block (hiopKKTLinSys.hpp:292)
                    fact = (
                        kkt_nd.factorize_xycyd_safe_device
                        if tier == "ldl_nopiv"
                        else kkt_nd.factorize_xycyd_safe
                    )
                    return fact(
                        H, Dx, Dd, Jc, Jd,
                        p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
                    )
                if tier == "ldl_nopiv":
                    return kkt_nd.factorize_safe_device(
                        H, Dx, Dd, Jc, Jd,
                        p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
                    )
                return kkt_nd.factorize_safe(
                    H, Dx, Dd, Jc, Jd,
                    p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
                )
            # the quick tier's range-space (Schur) elimination of x produces
            # the SAME reduced system for both compressed linearizations, so
            # xycyd and xdycyd share it; the realizations differ in the safe
            # tiers' assembled matrices
            return kkt_nd.factorize_quick(
                H, Dx, Dd, Jc, Jd,
                p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
            )

    def _solve_factors(self, f, rx_t, rd_t, ryc, ryd):
        if self.fact_dtype != jnp.float64:
            rx_t, rd_t = self._cast(rx_t), self._cast(rd_t)
            ryc, ryd = self._cast(ryc), self._cast(ryd)
        if self.kkt_kind == "condensed":
            dx, dd, dyd = kkt_cond.solve(f, rx_t, rd_t, ryd, self.perturb.delta_cd)
            out = dx, dd, jnp.zeros_like(ryc), dyd
        elif self.kkt_kind == "normaleqn":
            out = kkt_ne.solve(f, rx_t, rd_t, ryc, ryd)
        elif self._safe_mode:
            if isinstance(
                f, (kkt_nd.XycydSafeFactors, kkt_nd.XycydDeviceLdlFactors)
            ):
                # 3x3 solve in (dx, dyc, dyd); recover dd from the d-row
                # (hiopKKTLinSys.cpp:620,670): ryd_t = ryd + Dd_tot^{-1} rd_t,
                # dd = Dd_tot^{-1} (rd_t + dyd)
                dd_tot = (self._Dd + self.perturb.delta_wd).astype(rd_t.dtype)
                dd_inv = jnp.where(
                    dd_tot > 0, 1.0 / jnp.maximum(dd_tot, 1e-300), 0.0
                )
                ryd_t = ryd + dd_inv * rd_t
                dx, dyc, dyd = kkt_nd.solve_xycyd_safe(f, rx_t, ryc, ryd_t)
                dd = dd_inv * (rd_t.astype(dyd.dtype) + dyd)
                out = (dx, dd, dyc, dyd)
            elif isinstance(f, kkt_nd.DeviceLdlFactors):
                out = kkt_nd.solve_safe_device(f, rx_t, rd_t, ryc, ryd)
            else:
                out = kkt_nd.solve_safe(f, rx_t, rd_t, ryc, ryd)
        else:
            out = kkt_nd.solve_quick(f, rx_t, rd_t, ryc, ryd)
        if self.fact_dtype != jnp.float64:
            out = tuple(a.astype(jnp.float64) for a in out)
        return out

    def _factorization_acceptable(self, f) -> Tuple[bool, bool]:
        """Returns (acceptable, singular)."""
        if self._safe_mode:
            if not bool(f.ok):
                # host LU: a non-finite factor means wrong inertia. Device
                # no-pivot LDL^T: a pivot breakdown is ambiguous between a
                # singular Jacobian and wrong inertia — route it to the
                # singularity handler, which bumps delta_c first and falls
                # through to the delta_w curve on repeats (the reference's
                # handling of a MAGMA-Nopiv zero pivot).
                return False, isinstance(
                    f, (kkt_nd.DeviceLdlFactors, kkt_nd.XycydDeviceLdlFactors)
                )
            n_neg = int(f.n_neg_eig)
            if n_neg < 0:
                return False, True
            if self.inertia_free:
                return True, False
            if n_neg != f.mc + f.md:
                # highly degenerate systems can defeat the floating-point
                # inertia count; after repeated mismatches fall back to the
                # inertia-free curvature acceptor (the reference's
                # recommended acceptor for such systems)
                self._inertia_mismatches = getattr(self, "_inertia_mismatches", 0) + 1
                if self._inertia_mismatches >= 3:
                    self.log.printf(
                        Verbosity.SCALARS,
                        "inertia count unreliable (%d != %d); switching to the "
                        "inertia-free curvature test", n_neg, f.mc + f.md,
                    )
                    self.inertia_free = True
                    return True, False
                return False, False
            return True, False
        if self.kkt_kind == "full":
            # nonsymmetric LU: failure can only mean (near-)singularity
            return (True, False) if bool(f.ok) else (False, True)
        if self.kkt_kind in ("condensed", "normaleqn"):
            # single SPD factorization: failure means wrong curvature
            return bool(f.ok), False
        # quick path: Cholesky of the Hessian block failing means wrong
        # inertia (bump delta_w); Cholesky of the Schur complement failing
        # means a singular Jacobian (bump delta_c)
        if not bool(f.ok_k):
            return False, False
        if not bool(f.ok_s):
            return False, True
        return True, False

    def _mp_safe_f32_device(self) -> bool:
        """f32 safe-tier factorizations only make sense on the on-device
        no-pivot LDL^T tier (host scipy tiers are natively f64)."""
        return (
            self._safe_mode > 0
            and self._safe_tiers[self._safe_mode - 1] == "ldl_nopiv"
        )

    def compute_direction(self, resid, it: Iterate, b: Bounds) -> Tuple[Iterate, bool]:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        n_correction = 0
        for attempt in range(self.MAX_REFACT):
            f = self._factorize()
            acceptable, singular = self._factorization_acceptable(f)
            if not acceptable and self._safe_mode and self.fact_dtype == jnp.float32:
                # f32 pivot signs are not trusted through a rejection:
                # redo this direction in f64 with the deltas unchanged
                _mp_demote(self, "f32 safe-tier factorization rejected")
                continue
            if not acceptable:
                n_correction += 1
                self.stats.kkt.n_update_corrections = n_correction
                ok = (
                    self.perturb.compute_perturb_singularity()
                    if singular
                    else self.perturb.compute_perturb_wrong_inertia()
                )
                if not ok:
                    if (
                        self._safe_mode < len(self._safe_tiers)
                        and self.kkt_kind in ("xdycyd", "xycyd")
                        and self.linsol_mode != "forcequick"
                    ):
                        # escalate through the safe tiers (switch_to_safer_KKT)
                        self._safe_mode += 1
                        self.log.printf(
                            Verbosity.SCALARS,
                            "KKT: switching to safe mode (%s)",
                            self._safe_tiers[self._safe_mode - 1],
                        )
                        self.perturb.compute_initial_deltas()
                        continue
                    raise _StepComputationError("regularization exhausted")
                continue
            self._factors = f
            with self.stats.kkt.tm_solve_inner:
                if self.kkt_kind == "full":
                    dir_full = kkt_full.solve_full(f, resid)
                    dx, dd = dir_full.x, dir_full.d
                else:
                    dir_full = None
                    dx, dd, dyc, dyd = self._solve_factors(f, rx_t, rd_t, ryc, ryd)
                    if self.fact_dtype != jnp.float64 and self.kkt_kind in (
                        "xdycyd", "xycyd",
                    ):
                        was_f32 = self.fact_dtype == jnp.float32
                        dx, dd, dyc, dyd = self._inner_refine(
                            f, (rx_t, rd_t, ryc, ryd), (dx, dd, dyc, dyd)
                        )
                        if was_f32 and self.fact_dtype == jnp.float64:
                            # certification failed and the schedule demoted:
                            # do NOT use the uncertified direction — redo
                            # this iteration's factorization in f64 (the MDS
                            # path's retry, ADVICE r3)
                            n_correction += 1
                            self.stats.kkt.n_update_corrections = n_correction
                            continue
            if (
                not self.inertia_free
                and self._safe_mode
                and self.fact_dtype == jnp.float32
            ):
                # f32 pivot signs can flip on near-zero pivots and falsely
                # report correct inertia; cross-check the accepted f32
                # safe-tier factorization with the curvature test (the MDS
                # safe_f32 branch's acceptance, ADVICE r3)
                p = self.perturb
                good = bool(
                    kkt_nd.curvature_test(
                        self._H, self._Dx, self._Dd, p.delta_wx, p.delta_wd,
                        dx, dd, self.neg_curv_fact,
                    )
                )
                if not good:
                    n_correction += 1
                    self.stats.kkt.n_update_corrections = n_correction
                    if not self.perturb.compute_perturb_wrong_inertia():
                        raise _StepComputationError(
                            "f32 curvature cross-check regularization exhausted"
                        )
                    continue
            if self.inertia_free:
                p = self.perturb
                good = bool(
                    kkt_nd.curvature_test(
                        self._H, self._Dx, self._Dd, p.delta_wx, p.delta_wd,
                        dx, dd, self.neg_curv_fact,
                    )
                )
                if not good:
                    n_correction += 1
                    self.stats.kkt.n_update_corrections = n_correction
                    if not self.perturb.compute_perturb_wrong_inertia():
                        raise _StepComputationError("curvature regularization exhausted")
                    continue
            self.perturb.update_fact_ok()
            if dir_full is not None:
                dir_ = dir_full
            else:
                dir_ = res_mod.recover_direction(resid, it, b, dx, dd, dyc, dyd)
            dir_ = self._maybe_refine(resid, it, b, dir_)
            return dir_, True
        raise _StepComputationError("max refactorizations reached")

    def _inner_refine(self, f, rhs4, sol4):
        """FGMRES inner iterative refinement of the mixed-precision
        compressed solve: the f64 XDYcYd operator is the matvec, the f32
        factorization is the (flexible right) preconditioner — the
        reference's ReSolve FGMRES-IR pattern
        (ReSolve/IterativeRefinement.hpp:25), driven by the ir_inner_*
        options."""
        o = self.nlp.options
        maxit = o.integer("ir_inner_maxit")
        if maxit <= 0:
            return sol4
        p = self.perturb
        deltas = (p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd)
        H, Dx, Dd, Jc, Jd = self._H, self._Dx, self._Dd, self._Jc, self._Jd

        def matvec(v):
            return kkt_nd.xdycyd_matvec(H, Dx, Dd, Jc, Jd, *deltas, *v)

        def precond(v):
            return self._solve_factors(f, *v)

        # adaptive tolerance: factor*mu, floored by ir_inner_tol (the f32
        # schedule keeps mu >= 1e-4 here, so the default target is 1e-6)
        tol = max(o.num("ir_inner_tol"), o.num("ir_inner_tol_factor") * self._mu)
        refined, info = krylov.fgmres(
            matvec, rhs4, M_inv=precond, x0=sol4, tol=tol,
            restart=o.integer("ir_inner_restart"), maxit=maxit,
            gs_scheme=o.str_("ir_inner_gs_scheme"),
        )
        self.stats.kkt.n_iter_refin_inner += info.iters
        if self._mp_schedule == "adaptive" and not info.converged:
            # the f32 factorization stopped being a good enough
            # preconditioner for the f64 system at this conditioning
            _mp_demote(self, "inner FGMRES-IR did not converge")
        return refined if info.converged or info.iters > 0 else sol4

    def _maybe_refine(self, resid, it: Iterate, b: Bounds, dir_: Iterate) -> Iterate:
        """Outer BiCGStab iterative refinement over the full 12-block KKT
        operator, preconditioned by the compressed direct solve
        (compute_directions_w_IR, hiopKKTLinSys.cpp:911-956)."""
        if self.ir_maxit <= 0:
            return dir_
        p = self.perturb
        deltas = (p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd)
        with self.stats.kkt.tm_resid:
            rn, bn = kkt_full.direction_residual_norms(
                self._H, self._Jc, self._Jd, it, b, *deltas, resid, dir_
            )
            res_norm = float(rn)
            rhs_norm = max(float(bn), 1e-300)
        tol = max(self.ir_tol_min, self.ir_tol_factor * self._mu)
        if res_norm <= tol * rhs_norm:
            return dir_
        rhs = kkt_full.residual_to_rhs(resid)

        def matvec(d):
            return kkt_full.full_kkt_matvec(
                self._H, self._Jc, self._Jd, it, b, *deltas, d
            )

        def precond(v):
            res_v = v._replace(rxl=-v.rxl, rxu=-v.rxu, rdl=-v.rdl, rdu=-v.rdu)
            return self.solve_rhs(res_v, it, b)

        refined, info = krylov.bicgstab(
            matvec, rhs, M_inv=precond, x0=dir_, tol=tol, maxit=self.ir_maxit
        )
        self.stats.kkt.n_iter_refin_outer += info.iters
        if not info.converged and info.resid_norm > res_norm:
            return dir_  # refinement diverged; keep the direct solution
        return refined

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        if self.kkt_kind == "full":
            return kkt_full.solve_full(self._factors, resid)
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        dx, dd, dyc, dyd = self._solve_factors(self._factors, rx_t, rd_t, ryc, ryd)
        return res_mod.recover_direction(resid, it, b, dx, dd, dyc, dyd)


class _CondensedMatfreeStrategy:
    """Matrix-free condensed KKT for large sparse inequality-only NLPs:
    triplet matvecs + Jacobi-preconditioned CG (kkt/condensed_matfree.py).
    CG negative-curvature breakdown plays the role of a failed Cholesky in
    the regularization ladder."""

    MAX_REFACT = 10

    def __init__(self, nlp, logger, stats):
        from hiop_tpu.kkt import condensed_matfree as cmf

        o = nlp.options
        if nlp.m_eq > 0:
            raise ValueError("condensed KKT requires an inequality-only NLP")
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(o, for_newton=True)
        self.ops = cmf.build_ops(
            nlp.jac_in_rows, nlp.jac_in_cols, nlp.hess_rows, nlp.hess_cols,
            nlp.n, nlp.m_ineq,
        )
        self.cg_maxit = max(o.integer("ir_inner_maxit") * 8, 400)
        self.cg_tol_min = o.num("ir_inner_tol")
        self._cg_solve = cmf.make_cg_solver(self.ops, maxit=self.cg_maxit)
        self._mu = 1.0
        self._state = None

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        with self.stats.kkt.tm_update_init:
            jd_vals = Jd.vals if hasattr(Jd, "vals") else None
            if jd_vals is None:
                _, jd_vals = self.nlp.eval_jac_vals_split(it.x)
            h_vals = self.nlp.eval_hess_vals(it.x, 1.0, it.yc, it.yd)
            Dx, Dd = res_mod.barrier_diagonals(it, b)
            self._state = (jd_vals, h_vals, Dx, Dd)
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)

    def _cg_tol(self):
        return max(self.cg_tol_min, min(1e-8, 1e-2 * self._mu))

    def _solve(self, rx_t, rd_t, ryd):
        jd_vals, h_vals, Dx, Dd = self._state
        p = self.perturb
        return self._cg_solve(
            h_vals, jd_vals, Dx, Dd, rx_t, rd_t, ryd,
            p.delta_wx, p.delta_wd, p.delta_cd, self._cg_tol(),
        )

    def compute_direction(self, resid, it: Iterate, b: Bounds):
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        n_corr = 0
        for _ in range(self.MAX_REFACT):
            with self.stats.kkt.tm_solve_inner:
                dx, dd, dyd, (conv, neg, iters, rnorm) = self._solve(rx_t, rd_t, ryd)
            self.stats.kkt.n_iter_refin_inner += int(iters)
            if bool(neg) or not bool(conv):
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                if not self.perturb.compute_perturb_wrong_inertia():
                    raise _StepComputationError("matrix-free regularization exhausted")
                continue
            self.perturb.update_fact_ok()
            dir_ = res_mod.recover_direction(
                resid, it, b, dx, dd, jnp.zeros_like(ryc), dyd
            )
            return dir_, True
        raise _StepComputationError("matrix-free CG failed to converge")

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        dx, dd, dyd, _info = self._solve(rx_t, rd_t, ryd)
        return res_mod.recover_direction(
            resid, it, b, dx, dd, jnp.zeros_like(ryc), dyd
        )


class _CondensedSparseDeviceStrategy:
    """Sparse condensed KKT with device CSR two-phase products
    (kkt/condensed_sparse_device.py — hiopKKTLinSysCondensedSparse's CSR
    machinery, hiopMatrixSparseCSR.hpp:116-261, with the SPD factorization
    on the device sparse LDL playing cuSOLVER-Cholesky's role).  A
    non-SPD factorization or an uncertified solve is a failed Cholesky:
    bump delta_w and retry (the condensed ladder semantics)."""

    MAX_REFACT = 10

    def __init__(self, nlp, logger, stats):
        from hiop_tpu.kkt.condensed_sparse_device import CondensedSparseDeviceKKT

        if nlp.m_eq > 0:
            raise ValueError("condensed KKT requires an inequality-only NLP")
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(nlp.options, for_newton=True)
        self.kkt = CondensedSparseDeviceKKT(nlp)
        self._mu = 1.0
        self._state = None

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        with self.stats.kkt.tm_update_init:
            jd_vals = Jd.vals if hasattr(Jd, "vals") else None
            if jd_vals is None:
                _, jd_vals = self.nlp.eval_jac_vals_split(it.x)
            h_vals = self.nlp.eval_hess_vals(it.x, 1.0, it.yc, it.yd)
            Dx, Dd = res_mod.barrier_diagonals(it, b)
            self._state = (h_vals, Dx, Dd, jd_vals)
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)

    def _try_solve(self, rx_t, rd_t, ryd):
        h_vals, Dx, Dd, jd_vals = self._state
        p = self.perturb
        with self.stats.kkt.tm_update_fact:
            ok = self.kkt.factorize(
                h_vals, Dx, Dd, jd_vals, (p.delta_wx, p.delta_wd, p.delta_cd)
            )
        if not ok:
            return None
        with self.stats.kkt.tm_solve_inner:
            return self.kkt.solve(rx_t, rd_t, ryd)

    def compute_direction(self, resid, it: Iterate, b: Bounds):
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        n_corr = 0
        for _ in range(self.MAX_REFACT):
            out = self._try_solve(rx_t, rd_t, ryd)
            if out is None:
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                if not self.perturb.compute_perturb_wrong_inertia():
                    raise _StepComputationError(
                        "sparse condensed regularization exhausted"
                    )
                continue
            dx, dd, dyd = out
            self.perturb.update_fact_ok()
            dir_ = res_mod.recover_direction(
                resid, it, b, dx, dd, jnp.zeros_like(ryc), dyd
            )
            return dir_, True
        raise _StepComputationError("sparse condensed factorization failed")

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        out = self._try_solve(rx_t, rd_t, ryd)
        if out is None:
            raise _StepComputationError("sparse condensed solve failed")
        dx, dd, dyd = out
        return res_mod.recover_direction(
            resid, it, b, dx, dd, jnp.zeros_like(ryc), dyd
        )


class _SparseDirectStrategy:
    """Host sparse-direct XDYcYd KKT (kkt/sparse_direct.py): O(nnz)
    triplet assembly + a registry-selected sparse LU (splu/SuperLU plays
    the reference's MA57 role, hiopKKTLinSysCompressedSparseXDYcYd,
    hiopKKTLinSysSparse.hpp:133). With LU backends (no inertia) acceptance
    is the inertia-free curvature test — the reference's pairing for
    non-inertia backends; the ``native_ldl`` backend reports pivot-sign
    inertia, enabling the reference's default inertia-correction
    acceptance (hiopFactAcceptorIC: n_neg must equal m_eq + m_ineq).
    Selected by naming a registered backend in the
    ``linear_solver_sparse`` option."""

    MAX_REFACT = 10

    def __init__(self, nlp, logger, stats):
        from hiop_tpu.kkt.sparse_direct import SparseXDYcYdKKT, SparseXYcYdKKT

        o = nlp.options
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(o, for_newton=True)
        self.neg_curv_fact = o.num("neg_curv_test_fact")
        self.inertia_free = o.str_("fact_acceptor") == "inertia_free"
        name = o.str_("linear_solver_sparse")
        self._solver_name = "splu" if name == "auto" else name
        # xycyd selects the 3-block realization (shared acceptance: both
        # linearizations expect m_eq + m_ineq negative eigenvalues)
        self._kkt_cls = (
            SparseXYcYdKKT if o.str_("KKTLinsys") == "xycyd" else SparseXDYcYdKKT
        )
        if self._solver_name == "device_ldl":
            from hiop_tpu.kkt.sparse_direct import DeviceSparseXDYcYdKKT

            if self._kkt_cls is SparseXYcYdKKT:
                logger.printf(
                    Verbosity.WARNING,
                    "device_ldl supports the XDYcYd realization only; "
                    "demoting KKTLinsys=xycyd to the host splu backend",
                )
                self._solver_name = "splu"
                self.kkt = self._kkt_cls(nlp, self._solver_name)
            else:
                try:
                    self.kkt = DeviceSparseXDYcYdKKT(nlp)
                except ValueError as e:
                    # the symbolic analysis refused the pattern (fill/op
                    # guards, linalg/sparse_device.py max_ops/max_lnz) —
                    # fall back to the host splu backend, like the
                    # reference demoting an unavailable GPU solver with a
                    # warning (hiopKKTLinSysSparse.cpp:277+)
                    logger.printf(
                        Verbosity.WARNING,
                        "device_ldl symbolic analysis refused this pattern "
                        "(%s); falling back to the host splu backend",
                        str(e),
                    )
                    self._solver_name = "splu"
                    self.kkt = self._kkt_cls(nlp, self._solver_name)
                    stats.kkt.n_device_ldl_fallback += 1
        else:
            self.kkt = self._kkt_cls(nlp, self._solver_name)
        self._mu = 1.0
        self._state = None
        self._chronic_delta = 0

    def _maybe_switch_to_inertia_backend(self) -> None:
        """Chronic-regularization escalation for the sparse-direct path:
        an LU backend has no inertia, so acceptance is the curvature test,
        which (like the dense quick tier, see _maybe_escalate_chronic)
        over-regularizes structurally indefinite problems. After 4
        consecutive regularized iterations, rebuild on the pivot-sign
        inertia backend (native_ldl, the MA57 role) so delta_w can return
        to ~0 whenever the true reduced Hessian is PD."""
        from hiop_tpu.linalg import solver_registry

        if self.perturb.delta_wx > 0.0:
            self._chronic_delta += 1
        else:
            self._chronic_delta = 0
        if (
            self._chronic_delta >= 4
            and self._solver_name != "native_ldl"
            and solver_registry.has_solver("native_ldl")
            # splu now reports diag(U) pivot-sign inertia when its no-pivot
            # symmetric mode holds; only escalate when the current backend
            # is actually inertia-less (pivoted fallback in effect)
            and self.kkt.last_inertia is None
        ):
            self._solver_name = "native_ldl"
            self.kkt = self._kkt_cls(self.nlp, "native_ldl")
            self._chronic_delta = 0
            self.log.printf(
                Verbosity.SCALARS,
                "sparse KKT: chronic regularization (delta_w=%.2e for 4 "
                "iters); switching to the pivot-sign inertia backend "
                "(native_ldl)", self.perturb.delta_wx,
            )

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        import numpy as np

        self._maybe_switch_to_inertia_backend()
        with self.stats.kkt.tm_update_init:
            nlp = self.nlp
            if hasattr(Jc, "vals"):
                je_vals, ji_vals = np.asarray(Jc.vals), np.asarray(Jd.vals)
            else:
                # gather the triplet entries back out of the dense Jacobians
                # (no re-evaluation of user callbacks)
                je_vals = np.asarray(Jc)[nlp.jac_eq_rows, nlp.jac_eq_cols]
                ji_vals = np.asarray(Jd)[nlp.jac_in_rows, nlp.jac_in_cols]
            h_vals = np.asarray(nlp.eval_hess_vals(it.x, 1.0, it.yc, it.yd))
            Dx, Dd = res_mod.barrier_diagonals(it, b)
            self._state = (h_vals, np.asarray(Dx), np.asarray(Dd), je_vals, ji_vals)
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)

    def _curvature_ok(self, dx, dd) -> bool:
        """dx'(H + Dx + delta_wx)dx + dd'(Dd + delta_wd)dd >= fact * ||(dx,dd)||^2
        with H applied through the upper triplets (test_direction,
        hiopKKTLinSys.cpp)."""
        import numpy as np

        h_vals, Dx, Dd, _, _ = self._state
        nlp, p = self.nlp, self.perturb
        hr, hc = nlp.hess_rows, nlp.hess_cols
        w = np.where(hr == hc, 1.0, 2.0)
        xhx = float(np.sum(w * h_vals * dx[hr] * dx[hc]))
        quad = (
            xhx
            + float(np.sum((Dx + p.delta_wx) * dx * dx))
            + float(np.sum((Dd + p.delta_wd) * dd * dd))
        )
        nrm2 = float(dx @ dx + dd @ dd)
        return quad >= self.neg_curv_fact * nrm2

    def compute_direction(self, resid, it: Iterate, b: Bounds):
        import numpy as np

        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        h_vals, Dx, Dd, je_vals, ji_vals = self._state
        n_corr = 0
        for _ in range(self.MAX_REFACT):
            p = self.perturb
            deltas = (p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd)
            with self.stats.kkt.tm_update_fact:
                ok = self.kkt.factorize(h_vals, Dx, Dd, je_vals, ji_vals, deltas)
            if ok:
                with self.stats.kkt.tm_solve_inner:
                    out = self.kkt.solve(rx_t, rd_t, ryc, ryd)
            if not ok or out is None:
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                if not self.perturb.compute_perturb_singularity():
                    raise _StepComputationError("sparse-direct regularization exhausted")
                continue
            dx, dd, dyc, dyd = out
            inert = self.kkt.last_inertia
            if inert is None:
                # backend lost its inertia report (splu pivoted fallback):
                # record it — a high count means the no-pivot symmetric mode
                # does not hold on this problem's KKT structure and
                # acceptance is silently degrading to the curvature test
                self.stats.kkt.n_fact_no_inertia += 1
            if inert is not None and not self.inertia_free:
                # inertia-correction acceptance (hiopFactAcceptorIC): the
                # XDYcYd augmented system must have exactly m_eq + m_ineq
                # negative and n + m_ineq positive eigenvalues
                npos, nneg, nzero = inert
                if nzero > 0 or nneg != self.nlp.m_eq + self.nlp.m_ineq:
                    n_corr += 1
                    self.stats.kkt.n_update_corrections = n_corr
                    # zero pivots signal a singular system (rank-deficient
                    # Jacobian rows): the delta_c handler, not the delta_w
                    # curve (hiopPDPerturbation's csingular vs cwrong split)
                    ok_p = (
                        self.perturb.compute_perturb_singularity()
                        if nzero > 0
                        else self.perturb.compute_perturb_wrong_inertia()
                    )
                    if not ok_p:
                        raise _StepComputationError(
                            "inertia regularization exhausted"
                        )
                    continue
            elif not self._curvature_ok(dx, dd):
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                if not self.perturb.compute_perturb_wrong_inertia():
                    raise _StepComputationError("curvature regularization exhausted")
                continue
            self.perturb.update_fact_ok()
            dir_ = res_mod.recover_direction(
                resid, it, b,
                jnp.asarray(dx), jnp.asarray(dd), jnp.asarray(dyc), jnp.asarray(dyd),
            )
            return dir_, True
        raise _StepComputationError("max refactorizations reached")

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        dx, dd, dyc, dyd = self.kkt.solve(rx_t, rd_t, ryc, ryd)
        return res_mod.recover_direction(
            resid, it, b,
            jnp.asarray(dx), jnp.asarray(dd), jnp.asarray(dyc), jnp.asarray(dyd),
        )


class _SparseFullStrategy:
    """Sparse-direct solve of the UNREDUCED 12-block KKT for sparse NLPs
    (hiopKKTLinSysSparseFull, hiopKKTLinSysSparse.hpp:202): O(nnz) triplet
    assembly (kkt/full_space_sparse.py) + nonsymmetric registry LU — no
    dense (N, N) operator is ever materialized. A nonsymmetric LU carries
    no inertia, so acceptance is the inertia-free curvature test, the same
    pairing the reference documents for its PARDISO-nonsym branch."""

    MAX_REFACT = 10

    def __init__(self, nlp, logger, stats):
        from hiop_tpu.kkt.full_space_sparse import SparseFullKKT

        o = nlp.options
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(o, for_newton=True)
        self.neg_curv_fact = o.num("neg_curv_test_fact")
        name = o.str_("linear_solver_sparse")
        name = "splu" if name == "auto" else name
        from hiop_tpu.linalg import solver_registry as _reg

        if _reg.is_symmetric_only(name):
            # a one-triangle LDL^T backend would silently factorize the
            # symmetrized unreduced KKT and produce wrong directions; the
            # reference restricts this class to nonsymmetric solvers
            # (hiopKKTLinSysSparse.cpp:845-849)
            raise ValueError(
                f"KKTLinsys=full requires a nonsymmetric-capable sparse solver; "
                f"{name!r} is symmetric-only (set linear_solver_sparse=splu/auto)"
            )
        self.kkt = SparseFullKKT(nlp, name)
        self._mu = 1.0
        self._state = None

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        import numpy as np

        with self.stats.kkt.tm_update_init:
            nlp = self.nlp
            if hasattr(Jc, "vals"):
                je_vals, ji_vals = np.asarray(Jc.vals), np.asarray(Jd.vals)
            else:
                je_vals = np.asarray(Jc)[nlp.jac_eq_rows, nlp.jac_eq_cols]
                ji_vals = np.asarray(Jd)[nlp.jac_in_rows, nlp.jac_in_cols]
            h_vals = np.asarray(nlp.eval_hess_vals(it.x, 1.0, it.yc, it.yd))
            self._state = (h_vals, je_vals, ji_vals)
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)

    def _curvature_ok(self, dx, dd, Dx, Dd) -> bool:
        import numpy as np

        h_vals, _, _ = self._state
        nlp, p = self.nlp, self.perturb
        hr, hc = nlp.hess_rows, nlp.hess_cols
        dx = np.asarray(dx)
        dd = np.asarray(dd)
        w = np.where(np.asarray(hr) == np.asarray(hc), 1.0, 2.0)
        quad = (
            float(np.sum(w * h_vals * dx[hr] * dx[hc]))
            + float(np.sum((np.asarray(Dx) + p.delta_wx) * dx * dx))
            + float(np.sum((np.asarray(Dd) + p.delta_wd) * dd * dd))
        )
        return quad >= self.neg_curv_fact * float(dx @ dx + dd @ dd)

    def compute_direction(self, resid, it: Iterate, b: Bounds):
        h_vals, je_vals, ji_vals = self._state
        Dx, Dd = res_mod.barrier_diagonals(it, b)
        n_corr = 0
        for _ in range(self.MAX_REFACT):
            p = self.perturb
            deltas = (p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd)
            with self.stats.kkt.tm_update_fact:
                ok = self.kkt.factorize(h_vals, je_vals, ji_vals, it, b, deltas)
            if ok:
                with self.stats.kkt.tm_solve_inner:
                    dir_ = self.kkt.solve(resid)
            if not ok or dir_ is None:
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                # LU failure on the unreduced system can only signal
                # (near-)singularity (no inertia): delta_c handler
                if not self.perturb.compute_perturb_singularity():
                    raise _StepComputationError("full-KKT regularization exhausted")
                continue
            if not self._curvature_ok(dir_.x, dir_.d, Dx, Dd):
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                if not self.perturb.compute_perturb_wrong_inertia():
                    raise _StepComputationError("curvature regularization exhausted")
                continue
            self.perturb.update_fact_ok()
            return dir_, True
        raise _StepComputationError("max refactorizations reached")

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        dir_ = self.kkt.solve(resid)
        if dir_ is None:
            # non-finite LU solution on the current factorization: surface a
            # handled step-computation failure (SOC/soft-FR callers treat it
            # as "correction unavailable") instead of returning None into
            # fraction_to_the_boundary
            raise _StepComputationError("full-KKT solve produced non-finite direction")
        return dir_


class _MdsStrategy:
    """Mixed dense-sparse KKT (hiopKKTLinSysCompressedMDSXYcYd): diagonal
    sparse Hessian block eliminated, dense block Cholesky, Schur Cholesky
    (see kkt/mds.py). Inertia-free acceptance (the all-Cholesky reduction
    carries no inertia), with the same regularization ladder."""

    MAX_REFACT = 10

    def __init__(self, nlp, logger, stats):
        o = nlp.options
        self.nlp = nlp
        self.log = logger
        self.stats = stats
        self.perturb = make_perturbation(o, for_newton=True)
        self.neg_curv_fact = o.num("neg_curv_test_fact")
        self.inertia_free = o.str_("fact_acceptor") == "inertia_free"
        self.linsol_mode = o.str_("linsol_mode")
        self.ns = nlp.n_sparse
        self._fact_dtype_opt = (
            jnp.float32 if o.str_("kkt_fact_dtype") == "float32" else jnp.float64
        )
        self._mu = 1.0
        self._data = None
        self._factors = None
        # safe-mode escalation to an inertia-revealing factorization of the
        # partially reduced saddle system (the reference's MAGMA-BuKa MDS
        # escalation, hiopKKTLinSysMDS.cpp:437-477)
        self._safe_mode = 0
        self._safe_tiers = _dense_safe_tiers(o)
        self._chronic_delta = 0
        _mp_init(self, o)
        self._mp_on_accel = None
        # triplet-based Schur assembly (the reference's addMDinv* kernels):
        # precompute the same-column nonzero pairs once; quick-tier
        # factorizations then assemble Js Ks^-1 Js^T in O(sum deg^2)
        # scatter-adds instead of the dense (m, n_s) @ (n_s, m) matmul
        from hiop_tpu.kkt import mds as _kkt_mds
        import numpy as _np

        stacked_rows = _np.concatenate([
            _np.asarray(nlp.jac_sp_eq_rows, dtype=_np.int64),
            nlp.m_eq + _np.asarray(nlp.jac_sp_in_rows, dtype=_np.int64),
        ])
        stacked_cols = _np.concatenate([
            _np.asarray(nlp.jac_sp_eq_cols, dtype=_np.int64),
            _np.asarray(nlp.jac_sp_in_cols, dtype=_np.int64),
        ])
        self._js_pairs = _kkt_mds.build_schur_pairs(
            stacked_rows, stacked_cols, nlp.n_sparse
        )
        self._js_rows = stacked_rows
        self._js_cols = stacked_cols
        # bordered sparse host safe tier first (MdsSchurHostFactors): the
        # saddle's m x m block is network-sparse, so the native
        # inertia-reporting LDL^T + a tiny dense Schur border beats a dense
        # (n_d + m)^2 factorization by orders of magnitude at ACOPF scale
        from hiop_tpu.native.ldl import native_available as _native_ok

        if self._js_pairs is not None and _native_ok():
            self._safe_tiers = ("schur_sparse_ldl",) + tuple(self._safe_tiers)

    @property
    def fact_dtype(self):
        """Mixed-precision schedule — see :func:`_mp_fact_dtype`."""
        return _mp_fact_dtype(self)

    def _mp_safe_f32_device(self) -> bool:
        """On an accelerator the f32 safe tier overrides the host tiers
        entirely (kkt_mds.factorize_safe device LDL^T); on CPU the host
        f64 LU is both faster and stabler, so never f32 there."""
        from hiop_tpu.backends.execspace import on_accelerator

        if self._mp_on_accel is None:
            self._mp_on_accel = on_accelerator()
        return self._mp_on_accel

    def _cast(self, a):
        return a.astype(self.fact_dtype) if a.dtype != self.fact_dtype else a

    def prepare(self, it: Iterate, grad_f, Jc, Jd, b: Bounds, mu) -> None:
        _maybe_deescalate_safe(self)
        _maybe_escalate_chronic(self, True)
        ns = self.ns
        with self.stats.kkt.tm_update_init:
            hss, Hdd = self.nlp.eval_hess_blocks(it.x, 1.0, it.yc, it.yd)
            Dx, Dd = res_mod.barrier_diagonals(it, b)
            self._data = dict(
                hss=hss, Hdd=Hdd, Dxs=Dx[:ns], Dxd=Dx[ns:], Dd=Dd,
                Jc_s=Jc[:, :ns], Jc_d=Jc[:, ns:],
                Jd_s=Jd[:, :ns], Jd_d=Jd[:, ns:],
            )
            if self._js_pairs is not None:
                nlp = self.nlp
                parts = []
                if nlp.m_eq:
                    parts.append(Jc[nlp.jac_sp_eq_rows, nlp.jac_sp_eq_cols])
                if nlp.m_ineq:
                    parts.append(Jd[nlp.jac_sp_in_rows, nlp.jac_sp_in_cols])
                self._data["js_vals"] = (
                    jnp.concatenate(parts) if parts else jnp.zeros((0,))
                )
        self.perturb.set_mu(float(mu))
        self.perturb.compute_initial_deltas()
        self._mu = float(mu)
        self._factors = None

    def _factorize(self):
        from hiop_tpu.kkt import mds as kkt_mds

        p = self.perturb
        _mp_count_fact(self)
        d = self._data
        args = (
            self._cast(d["hss"]), self._cast(d["Hdd"]),
            self._cast(d["Dxs"]), self._cast(d["Dxd"]), self._cast(d["Dd"]),
            self._cast(d["Jc_s"]), self._cast(d["Jc_d"]),
            self._cast(d["Jd_s"]), self._cast(d["Jd_d"]),
            p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
        )
        with self.stats.kkt.tm_update_fact:
            if self._safe_mode:
                if self.fact_dtype == jnp.float32:
                    # device f32 safe tier (args are already cast): blocked
                    # no-pivot LDL^T, curvature-accepted and IR-certified
                    # downstream; triplet Schur assembly when available
                    if self._js_pairs is not None:
                        return kkt_mds.factorize_safe(
                            *args, host=False,
                            js_vals=self._cast(d["js_vals"]),
                            js_pairs=self._js_pairs,
                        )
                    return kkt_mds.factorize_safe(*args, host=False)
                tier = self._safe_tiers[self._safe_mode - 1]
                if tier == "schur_sparse_ldl":
                    import numpy as _np

                    p_ = self.perturb
                    Jdn = jnp.concatenate([d["Jc_d"], d["Jd_d"]], axis=0)
                    return kkt_mds.factorize_safe_schur(
                        d["hss"], d["Hdd"], d["Dxs"], d["Dxd"], d["Dd"],
                        _np.asarray(Jdn), self._js_rows, self._js_cols,
                        _np.asarray(d["js_vals"]), self._js_pairs,
                        p_.delta_wx, p_.delta_wd, p_.delta_cc, p_.delta_cd,
                        self.nlp.m_eq, self.nlp.m_ineq,
                    )
                return kkt_mds.factorize_safe(*args, host=(tier == "lu_eig"))
            if self._js_pairs is not None:
                return kkt_mds.factorize(
                    *args,
                    js_vals=self._cast(d["js_vals"]),
                    js_pairs=self._js_pairs,
                )
            return kkt_mds.factorize(*args)

    def _solve(self, f, rx_t, rd_t, ryc, ryd):
        from hiop_tpu.kkt import mds as kkt_mds

        ns = self.ns
        if self.fact_dtype != jnp.float64:
            rx_t, rd_t = self._cast(rx_t), self._cast(rd_t)
            ryc, ryd = self._cast(ryc), self._cast(ryd)
        if isinstance(f, kkt_mds.MdsSchurHostFactors):
            solver = kkt_mds.solve_safe_schur
        elif isinstance(f, kkt_mds.MdsSafeFactors):
            solver = kkt_mds.solve_safe
        else:
            solver = kkt_mds.solve
        dxs, dxd, dd, dyc, dyd = solver(
            f, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd
        )
        out = jnp.concatenate([dxs, dxd]), dd, dyc, dyd
        if self.fact_dtype != jnp.float64:
            out = tuple(a.astype(jnp.float64) for a in out)
        return out

    def _mds_matvec(self, v):
        """f64 compressed XDYcYd operator with the block MDS Hessian (same
        convention as kkt_nd.xdycyd_matvec; dx carries [dxs; dxd]) — one
        fused jitted dispatch, not a chain of eager ops (each eager op is a
        full relay round trip on this TPU, docs/kernels.md)."""
        d = self._data
        p = self.perturb
        return _mds_matvec_jit(
            d["hss"], d["Dxs"], d["Dxd"], d["Dd"], d["Hdd"],
            d["Jc_s"], d["Jc_d"], d["Jd_s"], d["Jd_d"],
            p.delta_wx, p.delta_wd, p.delta_cc, p.delta_cd,
            self.ns, *v,
        )

    def _inner_refine_mds(self, f, rhs4, sol4):
        """FGMRES inner IR of the mixed-precision MDS compressed solve: f64
        block operator matvec, f32 factorization as the flexible right
        preconditioner (the ReSolve pattern, ReSolve/IterativeRefinement.hpp:25
        — the dense strategies' _inner_refine for the MDS realization).
        Returns (*refined, certified)."""
        o = self.nlp.options
        # certification budget: each FGMRES iteration costs several relay
        # round trips; if the f32 factors need more than ~16 of them the
        # f64 refactorization is the cheaper path
        maxit = min(o.integer("ir_inner_maxit"), 16)
        if maxit <= 0:
            return (*sol4, True)
        tol = max(o.num("ir_inner_tol"), o.num("ir_inner_tol_factor") * self._mu)
        refined, info = krylov.fgmres(
            self._mds_matvec, rhs4,
            M_inv=lambda v: self._solve(f, v[0], v[1], v[2], v[3]),
            x0=sol4, tol=tol,
            restart=o.integer("ir_inner_restart"), maxit=maxit,
            gs_scheme=o.str_("ir_inner_gs_scheme"),
        )
        self.stats.kkt.n_iter_refin_inner += info.iters
        out = refined if info.converged or info.iters > 0 else sol4
        return (*out, bool(info.converged))

    def compute_direction(self, resid, it: Iterate, b: Bounds):
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        d = self._data
        p = self.perturb
        n_corr = 0
        mp_retried = False
        for _ in range(self.MAX_REFACT):
            f = self._factorize()
            safe_f32 = self._safe_mode and self.fact_dtype == jnp.float32
            if safe_f32:
                # f32 pivot signs flip on near-zero pivots, so the f32
                # safe sub-tier uses the quick tier's inertia-free
                # curvature acceptance + IR certification instead of
                # exact pivot counts (SURVEY.md §7 stage-3 design note);
                # a breakdown (n_neg_eig = -1) or non-finite factor
                # demotes to the f64 tier below
                acceptable = bool(f.ok) and int(f.n_neg_eig) >= 0
                singular = False
            elif self._safe_mode:
                # inertia-revealing acceptance (hiopFactAcceptorIC)
                if not bool(f.ok):
                    # fact None = nonpositive eliminated diagonal block
                    # (wrong inertia); a device no-pivot LDL^T breakdown is
                    # ambiguous -> singularity handler (delta_c first,
                    # delta_w curve on repeats)
                    acceptable = False
                    singular = f.fact is not None and not f.host
                elif int(f.n_neg_eig) < 0:
                    acceptable, singular = False, True
                elif not self.inertia_free and int(f.n_neg_eig) != f.mc + f.md:
                    acceptable, singular = False, False
                else:
                    acceptable, singular = True, False
            else:
                acceptable = bool(f.ok)
                singular = bool(f.ok_k) and not bool(f.ok_s)
            if not acceptable and safe_f32:
                _mp_demote(self, "f32 safe-tier factorization rejected")
                continue
            if not acceptable:
                n_corr += 1
                self.stats.kkt.n_update_corrections = n_corr
                ok = (
                    p.compute_perturb_singularity()
                    if singular
                    else p.compute_perturb_wrong_inertia()
                )
                if not ok:
                    if (
                        self._safe_mode < len(self._safe_tiers)
                        and self.linsol_mode != "forcequick"
                    ):
                        self._safe_mode += 1
                        self.log.printf(
                            Verbosity.SCALARS,
                            "MDS KKT: switching to safe mode (%s)",
                            self._safe_tiers[self._safe_mode - 1],
                        )
                        p.compute_initial_deltas()
                        continue
                    raise _StepComputationError("MDS regularization exhausted")
                continue
            self._factors = f
            with self.stats.kkt.tm_solve_inner:
                dx, dd, dyc, dyd = self._solve(f, rx_t, rd_t, ryc, ryd)
            if self.fact_dtype == jnp.float32:
                dx, dd, dyc, dyd, certified = self._inner_refine_mds(
                    f, (rx_t, rd_t, ryc, ryd), (dx, dd, dyc, dyd)
                )
                if (
                    self._mp_schedule == "adaptive"
                    and not certified
                    and not mp_retried
                ):
                    _mp_demote(self, "MDS inner FGMRES-IR did not converge")
                    mp_retried = True
                    continue  # refactorize this direction in f64
            # curvature (inertia-free) test over the block Hessian; skipped
            # in safe mode with the inertia acceptor, where the pivot count
            # already certified the curvature
            ns = self.ns
            if safe_f32 or not (self._safe_mode and not self.inertia_free):
                dxs, dxd = dx[:ns], dx[ns:]
                dWd = float(
                    dxs @ ((d["hss"] + d["Dxs"] + p.delta_wx) * dxs)
                    + dxd @ (d["Hdd"] @ dxd)
                    + dxd @ ((d["Dxd"] + p.delta_wx) * dxd)
                    + dd @ ((d["Dd"] + p.delta_wd) * dd)
                )
                nrmsq = float(dx @ dx + dd @ dd)
                if dWd < nrmsq * self.neg_curv_fact:
                    if safe_f32 and not mp_retried:
                        # let the f64 inertia-revealing tier decide whether
                        # this really needs regularization
                        _mp_demote(self, "f32 safe-tier curvature test failed")
                        mp_retried = True
                        continue
                    n_corr += 1
                    self.stats.kkt.n_update_corrections = n_corr
                    if not p.compute_perturb_wrong_inertia():
                        raise _StepComputationError(
                            "MDS curvature regularization exhausted"
                        )
                    continue
            p.update_fact_ok()
            return res_mod.recover_direction(resid, it, b, dx, dd, dyc, dyd), True
        raise _StepComputationError("MDS max refactorizations reached")

    def solve_rhs(self, resid, it: Iterate, b: Bounds) -> Iterate:
        rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(resid, it, b)
        dx, dd, dyc, dyd = self._solve(self._factors, rx_t, rd_t, ryc, ryd)
        return res_mod.recover_direction(resid, it, b, dx, dd, dyc, dyd)


# =====================================================================
# base algorithm
# =====================================================================
class FilterIPMBase:
    """Shared IPM machinery (hiopAlgFilterIPMBase)."""

    # Wächter–Biegler constants (reference hiopAlgFilterIPM.cpp:259-268)
    gamma_theta = 1e-5
    gamma_phi = 1e-8
    s_theta = 1.1
    s_phi = 2.3
    delta = 1.0
    kappa_Sigma = 1e10
    kappa_d = 1e-5  # damping factor (hiopLogBarProblem kappa_d)

    def __init__(self, nlp: NlpFormulation):
        self.nlp = nlp
        nlp.finalize_initialization()
        self.opts = nlp.options
        self.log = nlp.log
        o = self.opts
        self.eps_tol = o.num("tolerance")
        self.cons_tol = o.num("cons_tol")
        self.dual_tol = o.num("dual_tol")
        self.comp_tol = o.num("comp_tol")
        self.rel_tol = o.num("rel_tolerance")
        self.kappa_eps = o.num("kappa_eps")
        self.kappa_mu = o.num("kappa_mu")
        self.theta_mu = o.num("theta_mu")
        self.tau_min = o.num("tau_min")
        self.kappa1 = o.num("kappa1")
        self.kappa2 = o.num("kappa2")
        self.smax = o.num("smax")
        self.eta_phi = o.num("eta_phi")
        self.mu0 = o.num("mu0")
        self.max_iter = o.integer("max_iter")
        self.accep_tol = o.num("acceptable_tolerance")
        self.accep_iters = o.integer("acceptable_iterations")
        self.theta_max_fact = o.num("theta_max_fact")
        self.theta_min_fact = o.num("theta_min_fact")
        self.min_step_size = o.num("min_step_size")
        self.max_soc_iter = o.integer("max_soc_iter")
        self.kappa_soc = o.num("kappa_soc")

        # kernel-dispatch backend (exec_policies: the reference's ExecSpace
        # policy axis maps to XLA-vs-Pallas kernel selection)
        from hiop_tpu.linalg import cholesky as chol_mod

        chol_mod.set_backend("pallas" if o.str_("exec_policies") == "pallas" else "xla")

        self.filter = Filter()
        self.theta_max = 1e7
        self.theta_min = 1e7
        self._n_accep = 0
        self._err_nlp0: Optional[float] = None

        self.iter_num = 0
        self.solver_status = SolveStatus.NlpSolve_SolveNotCalled

    # ------------------------------------------------------------- utilities
    def _eval_f_cons(self, x):
        f = self.nlp.eval_f(x)
        c, d = self.nlp.eval_cons(x)
        if not (np.isfinite(float(f)) and bool(jnp.all(jnp.isfinite(c))) and bool(jnp.all(jnp.isfinite(d)))):
            raise _UserEvalError()
        return f, c, d

    def _logbar_f(self, it: Iterate, f, b: Bounds, mu):
        """Barrier objective phi = f - mu*sum(log slacks) + damping."""
        val = f - mu * it_mod.eval_logbar(it, b)
        val = val + it_mod.linear_damping_term(it, b, mu, self.kappa_d)
        return float(val)

    def _logbar_grads(self, it: Iterate, grad_f, b: Bounds, mu):
        gx = it_mod.add_logbar_grad_x(grad_f, it, b, mu)
        gx = it_mod.add_damping_grad_x(gx, b, mu, self.kappa_d)
        gd = it_mod.add_logbar_grad_d(jnp.zeros_like(it.d), it, b, mu)
        gd = it_mod.add_damping_grad_d(gd, b, mu, self.kappa_d)
        return gx, gd

    def _theta_onenorm(self, it: Iterate, c, d):
        """One-norm primal infeasibility (compute_nlp_infeasib_onenorm)."""
        return float(jnp.sum(jnp.abs(self.nlp.crhs - c)) + jnp.sum(jnp.abs(it.d - d)))

    def _errors(self, it: Iterate, norms: res_mod.ResidualNorms):
        """Scaled NLP/barrier errors (evalNlpAndLogErrors)."""
        n, m = self.nlp.n, self.nlp.m
        eq1, bnd1 = it_mod.norm_one_of_duals(it)
        eq1, bnd1 = float(eq1), float(bnd1)
        sd = min(max(self.smax, (bnd1 + eq1) / max(n + m, 1)) / self.smax, 1e8)
        sc = 0.0 if n == 0 else min(max(self.smax, bnd1 / n) / self.smax, 1e8)
        cons_violation = float(norms.cons_violation)
        err_nlp = max(
            float(norms.nlp_optim) / sd,
            cons_violation,
            float(norms.nlp_complem) / sc if sc > 0 else 0.0,
        )
        err_log = max(
            float(norms.bar_optim) / sd,
            cons_violation,
            float(norms.bar_complem) / sc if sc > 0 else 0.0,
        )
        return err_nlp, err_log, cons_violation

    def _check_termination(self, err_nlp: float, norms) -> Optional[SolveStatus]:
        if err_nlp <= self.eps_tol:
            return SolveStatus.Solve_Success
        if self._err_nlp0 is not None and self.rel_tol > 0:
            if err_nlp <= self.rel_tol * self._err_nlp0:
                return SolveStatus.Solve_Success_RelTol
        if err_nlp <= self.accep_tol:
            self._n_accep += 1
            if self._n_accep >= self.accep_iters:
                return SolveStatus.Solve_Acceptable_Level
        else:
            self._n_accep = 0
        if self.iter_num >= self.max_iter:
            return SolveStatus.Max_Iter_Exceeded
        if float(norms.nlp_feasib) > 1e20:
            return SolveStatus.Iterates_Diverging
        return None

    def _update_mu(self, mu: float):
        """(update_log_barrier_params): returns (changed, mu_new, tau_new)."""
        target_comp_tol = self.comp_tol / self.nlp.scale_obj
        new_mu = max(0.0, min(self.kappa_mu * mu, mu**self.theta_mu))
        new_mu = max(new_mu, min(self.eps_tol, target_comp_tol) / 11.0)
        if abs(new_mu - mu) < 1e-16:
            return False, mu, max(self.tau_min, 1.0 - mu)
        return True, new_mu, max(self.tau_min, 1.0 - new_mu)

    def _accept_line_search_conditions(
        self,
        theta_curr: float,
        theta_trial: float,
        phi_curr: float,
        phi_trial: float,
        alpha_primal: float,
        grad_phi_dx: float,
    ) -> int:
        """Returns ls status: 0 rejected, 1 suff-decrease (far), 2
        suff-decrease (near), 3 Armijo (accept_line_search_conditions,
        hiopAlgFilterIPM.cpp:2856-2945)."""
        if theta_curr >= self.theta_min:
            if (
                theta_trial <= (1 - self.gamma_theta) * theta_curr
                or phi_trial <= phi_curr - self.gamma_phi * theta_curr
            ):
                if self.filter.contains(theta_trial, phi_trial):
                    return 0
                return 1
            return 0
        # near-feasibility: switching condition (19)
        if grad_phi_dx < 0 and alpha_primal * (-grad_phi_dx) ** self.s_phi > self.delta * theta_curr**self.s_theta:
            if phi_trial <= phi_curr + self.eta_phi * alpha_primal * grad_phi_dx:
                if self.filter.contains(theta_trial, phi_trial):
                    return 0
                return 3
            return 0
        if (
            theta_trial <= (1 - self.gamma_theta) * theta_curr
            or phi_trial <= phi_curr - self.gamma_phi * theta_curr
        ):
            if self.filter.contains(theta_trial, phi_trial):
                return 0
            return 2
        return 0

    def _output_iteration(self, f_nlp, err_feas, err_optim, mu, alpha_du, alpha_pr, ls_num, ls_status, use_soc=0, use_fr=0):
        """Per-iteration summary line (outputIteration); its format is a test
        interface (the reference diffs these tables across backends)."""
        if self.iter_num % 10 == 0:
            self.log.printf(
                Verbosity.SUMMARY,
                "iter    objective     inf_pr     inf_du   lg(mu)  alpha_du   alpha_pr linesrch",
            )
        obj_unscaled = float(f_nlp) / self.nlp.scale_obj
        if ls_status == -1:
            self.log.printf(
                Verbosity.SUMMARY,
                "%4d %14.7e %7.3e  %7.3e %6.2f  %7.3e  %7.3e  -(-)",
                self.iter_num, obj_unscaled, err_feas, err_optim,
                math.log10(mu), alpha_du, alpha_pr,
            )
        else:
            st = {1: "s", 2: "h", 3: "f"}.get(ls_status, "?")
            if use_soc:
                st = st.upper()
            if use_fr:
                st = "R"
            self.log.printf(
                Verbosity.SUMMARY,
                "%4d %14.7e %7.3e  %7.3e %6.2f  %7.3e  %7.3e  %d(%s)",
                self.iter_num, obj_unscaled, err_feas, err_optim,
                math.log10(mu), alpha_du, alpha_pr, ls_num, st,
            )

    # ------------------------------------------------------------------ run
    def _run_general(self) -> SolverResult:
        nlp = self.nlp
        stats = nlp.runstats
        stats.tm_optimize_total.restart()
        try:
            return self._run_loop(self._make_strategy())
        except _UserEvalError:
            self.solver_status = SolveStatus.Error_In_User_Function
            return SolverResult(self.solver_status, np.zeros(nlp.n), float("nan"), self.iter_num)
        except _StepComputationError as e:
            self.log.printf(Verbosity.ERROR, "Unrecoverable error in step computation: %s", str(e))
            self.solver_status = SolveStatus.Err_Step_Computation
            last = getattr(self, "_last_good", None)
            if last is not None:
                it_l, f_l, err_l, mu_l = last
                return SolverResult(
                    self.solver_status, np.asarray(it_l.x),
                    nlp.unscaled_obj(f_l), self.iter_num,
                    err_nlp=err_l, mu=mu_l,
                )
            return SolverResult(self.solver_status, np.zeros(nlp.n), float("nan"), self.iter_num)
        finally:
            stats.tm_optimize_total.stop()

    def _make_strategy(self):  # pragma: no cover - abstract
        raise NotImplementedError

    # ------------------------------------------------------------- main loop
    def _run_loop(self, strategy) -> SolverResult:
        nlp = self.nlp
        b: Bounds = nlp.bounds
        o = self.opts
        stats = nlp.runstats
        mu = self.mu0
        tau = max(self.tau_min, 1.0 - mu)

        # ---------------- starting procedure (cpp:290) ---------------------
        stats.tm_starting_point.restart()
        x_user = nlp.get_starting_point()
        nlp.maybe_setup_scaling(x_user)
        f0, c0, d0_eval = self._eval_f_cons(x_user)
        x0, d0 = it_mod.starting_point_primal(x_user, d0_eval, b, self.kappa1, self.kappa2)
        f, c, d_eval = self._eval_f_cons(x0)
        n, m_eq, m_ineq = nlp.n, nlp.m_eq, nlp.m_ineq
        it_curr = Iterate(
            x=x0,
            d=d0,
            sxl=jnp.ones((n,), x0.dtype), sxu=jnp.ones((n,), x0.dtype),
            sdl=jnp.ones((m_ineq,), x0.dtype), sdu=jnp.ones((m_ineq,), x0.dtype),
            yc=jnp.zeros((m_eq,), x0.dtype), yd=jnp.zeros((m_ineq,), x0.dtype),
            zl=b.ixl * 1.0, zu=b.ixu * 1.0,
            vl=b.idl * 1.0, vu=b.idu * 1.0,
        )
        it_curr = it_mod.determine_slacks(it_curr, b)
        # warm start: user-provided primal-dual point (hiopInterface
        # get_warmstart_point; option warm_start)
        it_curr, x0, d0, fcd, warm_used = self._apply_warm_start(
            it_curr, x0, d0, b
        )
        if fcd is not None:
            f, c, d_eval = fcd
        warm = warm_used or None
        grad_f = nlp.eval_grad_f(x0)
        Jc, Jd = nlp.eval_jac(x0)
        if warm is None and o.str_("duals_init") == "lsq":
            yc, yd = du.initial_duals_lsq(
                Jc, Jd, grad_f, it_curr.zl, it_curr.zu, it_curr.vl, it_curr.vu,
                o.num("duals_lsq_ini_max"),
            )
            it_curr = it_curr._replace(yc=yc, yd=yd)
        stats.tm_starting_point.stop()

        resid, norms = self._update_residual(it_curr, c, d_eval, grad_f, Jc, Jd, b, mu)
        theta0 = self._theta_onenorm(it_curr, c, d_eval)
        self.theta_max = self.theta_max_fact * max(1.0, theta0)
        self.theta_min = self.theta_min_fact * max(1.0, theta0)
        self.filter.reinitialize(self.theta_max)

        # checkpoint restore (checkpoint_load_on_start, cpp:1001-1034)
        ckpt_file = o.str_("checkpoint_file")
        if o.str_("checkpoint_load_on_start") == "yes":
            restored = self._try_restore_checkpoint(ckpt_file, strategy)
            if restored is not None:
                it_curr, mu = restored
                tau = max(self.tau_min, 1.0 - mu)
                f, c, d_eval = self._eval_f_cons(it_curr.x)
                grad_f = nlp.eval_grad_f(it_curr.x)
                Jc, Jd = nlp.eval_jac(it_curr.x)
                resid, norms = self._update_residual(
                    it_curr, c, d_eval, grad_f, Jc, Jd, b, mu
                )
        ckpt_save = o.str_("checkpoint_save") == "yes"
        ckpt_every = o.integer("checkpoint_save_every_N_iter")

        alpha_primal = alpha_dual = 0.0
        ls_status, ls_num, use_soc = -1, 0, 0
        disable_ls = o.str_("accept_every_trial_step") == "yes"
        self.solver_status = SolveStatus.NlpSolve_Pending
        self.iter_num = 0

        # fused -> general handoff (the reference's quick->safe switching
        # keeps the iterate, switch_to_safer_KKT hpp:468): when the fused
        # program exits needs-host, the general loop RESUMES from its last
        # iterate and barrier parameter instead of restarting from scratch
        # — the fused prefix's progress (typically the cheap early barrier
        # stages) is kept, and the host tiers only pay for the hard tail.
        handoff = getattr(self, "_fused_handoff", None)
        if handoff is not None:
            self._fused_handoff = None
            it_h, mu_h, it_done = handoff
            if bool(np.all(np.isfinite(np.asarray(it_h.x)))):
                it_curr = it_h
                mu = mu_h
                tau = max(self.tau_min, 1.0 - mu)
                f, c, d_eval = self._eval_f_cons(it_curr.x)
                grad_f = nlp.eval_grad_f(it_curr.x)
                Jc, Jd = nlp.eval_jac(it_curr.x)
                resid, norms = self._update_residual(
                    it_curr, c, d_eval, grad_f, Jc, Jd, b, mu
                )
                self.iter_num = it_done
                self.log.printf(
                    Verbosity.SUMMARY,
                    "resuming the general loop from the fused iterate "
                    "(iteration %d, mu=%.3e)", it_done, mu,
                )

        # problem summary + options echo at start (reference cpp:981-989;
        # version banner = hiopVersion parity)
        import hiop_tpu as _pkg

        self.log.printf(
            Verbosity.SUMMARY,
            "hiop_tpu %s | Problem: %d variables, %d eq + %d ineq constraints "
            "(%d/%d lower/upper var bounds, %d/%d ineq bounds); solver %s",
            _pkg.__version__, nlp.n, m_eq, m_ineq,
            nlp.n_bnds_low, nlp.n_bnds_upp, nlp.m_ineq_low, nlp.m_ineq_upp,
            type(self).__name__,
        )
        if o.str_("print_options") != "no":
            self.log.printf(
                Verbosity.SUMMARY, "%s",
                o.pretty_print(only_user_defined=o.str_("print_options") == "user_options"),
            )

        while True:
            err_nlp, err_log, cons_viol = self._errors(it_curr, norms)
            if self._err_nlp0 is None:
                self._err_nlp0 = err_nlp
            self._output_iteration(
                f, float(norms.nlp_feasib), float(norms.nlp_optim), mu,
                alpha_dual, alpha_primal, ls_num, ls_status, use_soc,
            )
            # make checkpointing callable from inside the user callback
            # (the reference's Ex1 saves sidre state from iterate_callback)
            self._ckpt_ref = (it_curr, mu, strategy)
            # best-effort return point: an unrecoverable later failure
            # returns this iterate (the reference reports the last iterate
            # on Err_Step_Computation rather than zeros/NaN)
            if np.isfinite(f):
                self._last_good = (it_curr, float(f), err_nlp, mu)
            info = IterateCallbackInfo(
                iter=self.iter_num, obj_value=nlp.unscaled_obj(f),
                logbar_obj_value=self._logbar_f(it_curr, f, b, mu),
                x=it_curr.x, z_L=it_curr.zl, z_U=it_curr.zu, s=it_curr.d,
                g=c, yc=it_curr.yc, yd=it_curr.yd,
                inf_pr=float(norms.nlp_feasib), inf_du=float(norms.nlp_optim),
                onenorm_pr=self._theta_onenorm(it_curr, c, d_eval),
                mu=mu, alpha_du=alpha_dual, alpha_pr=alpha_primal, ls_trials=ls_num,
            )
            if not nlp.user_callback_iterate(info):
                self.solver_status = SolveStatus.User_Stopped
                break

            term = self._check_termination(err_nlp, norms)
            if term is not None:
                self.solver_status = term
                break

            # forced restoration for testing the FR machinery (force_resto,
            # reference cpp:1384)
            if (
                o.str_("force_resto") == "yes"
                and self.iter_num == 1
                and not getattr(self, "within_fr", False)
                and not getattr(self, "_force_resto_done", False)
            ):
                from hiop_tpu.optimization.fr_problem import (
                    apply_feasibility_restoration,
                )

                self._force_resto_done = True
                fr = apply_feasibility_restoration(self, it_curr, mu, norms)
                if fr is not None:
                    it_curr = it_curr._replace(
                        x=jnp.asarray(fr["x"]), d=jnp.asarray(fr["d"])
                    )
                    it_curr, _ = it_mod.compute_safe_slacks(it_curr, it_curr, b, mu)
                    f, c, d_eval = self._eval_f_cons(it_curr.x)
                    grad_f = nlp.eval_grad_f(it_curr.x)
                    Jc, Jd = nlp.eval_jac(it_curr.x)
                    resid, norms = self._update_residual(
                        it_curr, c, d_eval, grad_f, Jc, Jd, b, mu
                    )
                    self.filter.reinitialize(self.theta_max)

            # ------------- mu update loop (cpp:1168) -----------------------
            elastic_mode = o.str_("elastic_mode")
            while err_log <= self.kappa_eps * mu:
                changed, mu, tau = self._update_mu(mu)
                if not changed:
                    break
                self.log.printf(Verbosity.SCALARS, "barrier params reduced: mu=%g tau=%g", mu, tau)
                if elastic_mode != "none":
                    # tighten the bound relaxation as mu decreases
                    # (update_log_barrier_params elastic branch)
                    brp_ini = o.num("elastic_mode_bound_relax_initial")
                    brp_min = o.num("elastic_mode_bound_relax_final")
                    if o.str_("elastic_bound_strategy") == "mu_scaled":
                        brp = 0.995 * mu
                    else:  # mu_projected
                        brp = (mu - self.eps_tol) / max(self.mu0 - self.eps_tol, 1e-300) * (
                            brp_ini - brp_min
                        ) + brp_min
                    brp = min(max(brp, brp_min), brp_ini)
                    nlp.reset_bounds(brp)
                    b = nlp.bounds
                    if elastic_mode != "tighten_bound":
                        it_curr, n_adj = it_mod.compute_safe_slacks(it_curr, it_curr, b, mu)
                        if int(n_adj) > 0:
                            it_curr = it_mod.adjust_duals(it_curr, b, mu, self.kappa_Sigma)
                resid, norms = self._update_residual(it_curr, c, d_eval, grad_f, Jc, Jd, b, mu)
                err_nlp, err_log, cons_viol = self._errors(it_curr, norms)
                self.filter.reinitialize(self.theta_max)
                if elastic_mode != "none":
                    # reduce mu only once per iteration under elastic mode
                    break

            # ------------- search direction --------------------------------
            stats.kkt.start_iter()
            with stats.kkt.tm_total:
                strategy.prepare(it_curr, grad_f, Jc, Jd, b, mu)
                dir_, _dir_ok = strategy.compute_direction(resid, it_curr, b)
            if o.str_("time_kkt") == "on":
                self.log.printf(Verbosity.SUMMARY, "%s", stats.kkt.summary_last_iter())
            if o.str_("write_kkt") == "yes":
                from hiop_tpu.utils.kkt_io import dump_kkt

                Dx_dump, Dd_dump = res_mod.barrier_diagonals(it_curr, b)
                dump_kkt(
                    "hiop_tpu", self.iter_num,
                    H=getattr(strategy, "_H", None), Dx=Dx_dump, Dd=Dd_dump,
                    Jc=Jc if hasattr(Jc, "ndim") else None,
                    Jd=Jd if hasattr(Jd, "ndim") else None,
                    rx=resid.rx, rd=resid.rd, ryc=resid.ryc, ryd=resid.ryd,
                    dx=dir_.x, dd=dir_.d, dyc=dir_.yc, dyd=dir_.yd,
                    mu=jnp.asarray(mu),
                )
            if o.str_("deepchecks") == "yes":
                self._deepchecks(it_curr, dir_, b)

            # ------------- line search -------------------------------------
            ap, ad = it_mod.fraction_to_the_boundary(it_curr, dir_, tau, b)
            alpha_primal, alpha_dual = float(ap), float(ad)
            # moving limits (ensure_moving_lims): cap the primal step so
            # |alpha*dx_i| <= lim_abs + lim_rel*|x_i| when enabled
            lim_abs = o.num("moving_lim_abs")
            lim_rel = o.num("moving_lim_rel")
            if lim_abs > 0 or lim_rel > 0:
                cap = lim_abs + lim_rel * jnp.abs(it_curr.x)
                dmax = jnp.max(jnp.abs(dir_.x))
                if float(dmax) > 0:
                    alpha_cap = float(jnp.min(cap / jnp.maximum(jnp.abs(dir_.x), 1e-300)))
                    if alpha_cap < alpha_primal:
                        alpha_primal = max(alpha_cap, self.min_step_size)
                        self.log.printf(
                            Verbosity.SCALARS,
                            "moving limits reduced alpha_primal to %g", alpha_primal,
                        )
            theta_curr = self._theta_onenorm(it_curr, c, d_eval)
            phi_curr = self._logbar_f(it_curr, f, b, mu)
            gx, gd = self._logbar_grads(it_curr, grad_f, b, mu)
            grad_phi_dx = float(gx @ dir_.x + gd @ dir_.d)

            ls_status, ls_num, use_soc = 0, 0, 0
            ini_step = True
            it_trial = None
            f_trial = c_trial = d_trial = None
            theta_trial = phi_trial = None
            small_step = False

            while True:
                if not ini_step and alpha_primal < self.min_step_size:
                    self.log.printf(
                        Verbosity.ERROR,
                        "Minimum step size reached; problem may be locally infeasible.",
                    )
                    small_step = True
                    break
                it_trial = it_mod.take_step_primals(it_curr, dir_, alpha_primal)
                it_trial, n_adj = it_mod.compute_safe_slacks(it_trial, it_curr, b, mu)
                f_trial, c_trial, d_trial = self._eval_f_cons(it_trial.x)
                theta_trial = self._theta_onenorm(it_trial, c_trial, d_trial)
                phi_trial = self._logbar_f(it_trial, f_trial, b, mu)
                ls_num += 1
                if disable_ls:
                    ls_status = 1
                    break
                ls_status = self._accept_line_search_conditions(
                    theta_curr, theta_trial, phi_curr, phi_trial, alpha_primal, grad_phi_dx
                )
                if ls_status > 0:
                    break
                if ini_step and theta_curr <= theta_trial and self.max_soc_iter > 0:
                    soc = self._try_soc(
                        strategy, it_curr, resid, b, mu, tau, c, d_eval,
                        c_trial, d_trial, theta_curr, theta_trial,
                        alpha_primal, phi_curr, grad_phi_dx,
                    )
                    if soc is not None:
                        (it_trial, f_trial, c_trial, d_trial, theta_trial,
                         phi_trial, alpha_primal, alpha_dual, dir_, ls_status) = soc
                        use_soc = 1
                        break
                alpha_primal *= 0.5
                ini_step = False

            use_fr = 0
            if small_step:
                # attempt feasibility restoration (the QN solver is always in
                # safe mode; cpp:1425)
                if err_nlp <= self.accep_tol:
                    self.solver_status = SolveStatus.Solve_Acceptable_Level
                    break
                # soft FR first (apply_feasibility_restoration cpp:3046-3050):
                # cheap retries on the existing factorization before the
                # nested FR NLP solve
                soft = None
                if not getattr(self, "within_fr", False):
                    soft = self._solve_soft_fr(
                        strategy, it_curr, resid, norms, dir_, b, mu, tau,
                        c, d_eval, grad_f, Jc, Jd,
                    )
                if soft is not None:
                    (it_trial, f_trial, c_trial, d_trial, theta_trial,
                     phi_trial, alpha_soft) = soft
                    self.log.printf(
                        Verbosity.SCALARS,
                        "soft feasibility restoration accepted (alpha=%g)",
                        alpha_soft,
                    )
                    alpha_primal = alpha_dual = alpha_soft
                    ls_status, ls_num, use_soc = 1, 0, 0
                    self.iter_num += 1
                    stats.n_iters = self.iter_num
                    it_curr = it_trial
                    f, c, d_eval = f_trial, c_trial, d_trial
                    grad_f = nlp.eval_grad_f(it_curr.x)
                    Jc, Jd = nlp.eval_jac(it_curr.x)
                    resid, norms = self._update_residual(
                        it_curr, c, d_eval, grad_f, Jc, Jd, b, mu
                    )
                    continue
                fr = None
                if not getattr(self, "within_fr", False) and hasattr(Jc, "ndim"):
                    from hiop_tpu.optimization.fr_problem import (
                        apply_feasibility_restoration,
                    )

                    fr = apply_feasibility_restoration(self, it_curr, mu, norms)
                if fr is None:
                    if self.solver_status != SolveStatus.Infeasible_Problem:
                        self.solver_status = SolveStatus.Steplength_Too_Small
                    break
                use_fr = 1
                it_trial = it_curr._replace(
                    x=jnp.asarray(fr["x"]), d=jnp.asarray(fr["d"])
                )
                it_trial, _ = it_mod.compute_safe_slacks(it_trial, it_curr, b, mu)
                f_trial, c_trial, d_trial = self._eval_f_cons(it_trial.x)
                theta_trial = self._theta_onenorm(it_trial, c_trial, d_trial)
                phi_trial = self._logbar_f(it_trial, f_trial, b, mu)
                ls_status, ls_num = 1, 0

            # filter augmentation (cpp:1383-1420); skipped after FR
            if use_fr:
                ls_status = 1
            elif ls_status == 1:
                if grad_phi_dx < 0 and alpha_primal * (-grad_phi_dx) ** self.s_phi > self.delta * theta_curr**self.s_theta:
                    if not (phi_trial <= phi_curr + self.eta_phi * alpha_primal * grad_phi_dx):
                        self.filter.add(theta_trial, phi_trial)
                else:
                    self.filter.add(theta_trial, phi_trial)
            elif ls_status == 2:
                self.filter.add(theta_trial, phi_trial)

            self.iter_num += 1
            stats.n_iters = self.iter_num

            # ------------- dual update (dualsUpdate_->go) ------------------
            infeas_nrm_trial = theta_trial
            if use_fr:
                # duals are reinitialized after restoration: bound duals from
                # mu/slack, constraint duals from LSQ (the reference maps the
                # FR problem's duals back; mu/slack is the same fixed point)
                sxl = jnp.where(b.ixl == 1.0, it_trial.sxl, 1.0)
                sxu = jnp.where(b.ixu == 1.0, it_trial.sxu, 1.0)
                sdl = jnp.where(b.idl == 1.0, it_trial.sdl, 1.0)
                sdu = jnp.where(b.idu == 1.0, it_trial.sdu, 1.0)
                it_trial = it_trial._replace(
                    zl=jnp.where(b.ixl == 1.0, mu / sxl, 0.0),
                    zu=jnp.where(b.ixu == 1.0, mu / sxu, 0.0),
                    vl=jnp.where(b.idl == 1.0, mu / sdl, 0.0),
                    vu=jnp.where(b.idu == 1.0, mu / sdu, 0.0),
                )
                grad_f = nlp.eval_grad_f(it_trial.x)
                Jc, Jd = nlp.eval_jac(it_trial.x)
                yc_new, yd_new = du.initial_duals_lsq(
                    Jc, Jd, grad_f, it_trial.zl, it_trial.zu,
                    it_trial.vl, it_trial.vu, o.num("duals_lsq_ini_max"),
                )
                it_trial = it_trial._replace(yc=yc_new, yd=yd_new)
                self.filter.reinitialize(self.theta_max)
                it_curr = it_trial
                f, c, d_eval = f_trial, c_trial, d_trial
                resid, norms = self._update_residual(it_curr, c, d_eval, grad_f, Jc, Jd, b, mu)
                continue
            # ordering mirrors hiopDualsLsqUpdate::go: step the duals,
            # safeguard the bound duals, THEN least-squares-recompute yc/yd
            # from the *old* derivatives (the new derivatives are evaluated
            # after the dual update, cpp:1463-1476)
            it_trial = it_mod.take_step_duals(it_trial, dir_, alpha_primal, alpha_dual)
            it_trial = it_mod.adjust_duals(it_trial, b, mu, self.kappa_Sigma)
            if (
                o.str_("duals_update_type") == "lsq"
                and infeas_nrm_trial <= o.num("recalc_lsq_duals_tol")
            ):
                yc_new, yd_new = du.lsq_duals(
                    Jc, Jd, grad_f,
                    it_trial.zl, it_trial.zu, it_trial.vl, it_trial.vu,
                )
                it_trial = it_trial._replace(yc=yc_new, yd=yd_new)
            grad_f = nlp.eval_grad_f(it_trial.x)
            Jc, Jd = nlp.eval_jac(it_trial.x)

            it_curr = it_trial
            f, c, d_eval = f_trial, c_trial, d_trial
            resid, norms = self._update_residual(it_curr, c, d_eval, grad_f, Jc, Jd, b, mu)

            # periodic checkpoint (checkpointing_stuff, cpp:1152-1155)
            if ckpt_save and self.iter_num % ckpt_every == 0:
                self.save_state_to_file(ckpt_file, it_curr, mu, strategy)

        # ---------------- wrap up ------------------------------------------
        obj = nlp.unscaled_obj(f)
        nlp.user_callback_solution(
            self.solver_status, it_curr.x, it_curr.zl, it_curr.zu,
            jnp.concatenate([c, d_eval]) if (nlp.m_eq or nlp.m_ineq) else c,
            (it_curr.yc, it_curr.yd), obj,
        )
        err_nlp, _, _ = self._errors(it_curr, norms)
        self.log.printf(
            Verbosity.SUMMARY,
            "Solver status: %s, objective %.12e, iterations %d",
            self.solver_status.name, obj, self.iter_num,
        )
        self.log.printf(Verbosity.SCALARS, "%s", self.nlp.runstats.get_summary())
        from hiop_tpu.parallel.mesh import to_host

        x_host = to_host(it_curr.x)
        n_orig = getattr(nlp.problem, "_hiop_pad_n_orig", None)
        if n_orig is not None:
            x_host = x_host[:n_orig]  # trim mesh padding (PaddedDenseProblem)
        return SolverResult(
            status=self.solver_status,
            x=x_host,
            obj=obj,
            iterations=self.iter_num,
            err_nlp=err_nlp,
            mu=mu,
        )

    # ------------------------------------------------------------ deepchecks
    def _deepchecks(self, it_curr: Iterate, dir_: Iterate, b: Bounds) -> None:
        """Runtime numerical sanitizer (HIOP_DEEPCHECKS semantics): direction
        finiteness, slack positivity on-pattern, dual pattern matching."""
        import jax

        for name in Iterate._fields:
            v = getattr(dir_, name)
            if not bool(jnp.all(jnp.isfinite(v))):
                self.log.printf(
                    Verbosity.WARNING, "deepchecks: non-finite entries in direction %s", name
                )
        checks = [
            ("sxl", it_curr.sxl, b.ixl), ("sxu", it_curr.sxu, b.ixu),
            ("sdl", it_curr.sdl, b.idl), ("sdu", it_curr.sdu, b.idu),
        ]
        for name, s, pat in checks:
            ok = bool(jnp.all(jnp.where(pat == 1.0, s > 0, True)))
            if not ok:
                self.log.printf(
                    Verbosity.WARNING, "deepchecks: non-positive slack %s on pattern", name
                )
        for name, z, pat in [
            ("zl", it_curr.zl, b.ixl), ("zu", it_curr.zu, b.ixu),
            ("vl", it_curr.vl, b.idl), ("vu", it_curr.vu, b.idu),
        ]:
            ok = bool(jnp.all(jnp.where(pat == 0.0, z == 0.0, True)))
            if not ok:
                self.log.printf(
                    Verbosity.WARNING, "deepchecks: dual %s does not match its pattern", name
                )

    # --------------------------------------------------------- checkpointing
    def _collect_checkpoint(self, it_curr: Iterate, mu: float, strategy) -> dict:
        state = {
            "n": self.nlp.n, "m_eq": self.nlp.m_eq, "m_ineq": self.nlp.m_ineq,
            "mu": float(mu), "iter_num": int(self.iter_num),
            "theta_max": float(self.theta_max), "theta_min": float(self.theta_min),
            "filter_entries": self.filter._entries,
        }
        for name in Iterate._fields:
            state[f"it_{name}"] = np.asarray(getattr(it_curr, name))
        if isinstance(strategy, _LowRankStrategy):
            state["bfgs_S"] = np.asarray(strategy.bfgs.S)
            state["bfgs_Y"] = np.asarray(strategy.bfgs.Y)
            state["bfgs_active"] = np.asarray(strategy.bfgs.active)
            state["bfgs_sigma"] = float(strategy.bfgs.sigma)
        return state

    def save_state_to_file(self, path: str, it_curr: Iterate, mu: float, strategy) -> None:
        """Explicit checkpoint API (hiopAlgFilterIPM.hpp:399-421)."""
        from hiop_tpu.utils import checkpoint as ckpt

        ckpt.save_state(
            path,
            self._collect_checkpoint(it_curr, mu, strategy),
            fmt=self.opts.str_("checkpoint_format"),
        )

    def save_checkpoint(self, path: str) -> None:
        """Checkpoint the in-flight state; callable from an iterate callback
        (the reference's save_state_to_sidre_group usage in DenseConsEx1)."""
        ref = getattr(self, "_ckpt_ref", None)
        if ref is None:
            raise RuntimeError("no in-flight state; solver is not running")
        self.save_state_to_file(path, *ref)

    def _try_restore_checkpoint(self, path: str, strategy):
        """Returns (it_curr, mu) or None."""
        from hiop_tpu.utils import checkpoint as ckpt

        import os

        if not os.path.exists(path):
            self.log.printf(Verbosity.WARNING, "checkpoint file %s not found", path)
            return None
        state = ckpt.load_state(path)
        ckpt.validate(state, self.nlp.n, self.nlp.m_eq, self.nlp.m_ineq)
        it_curr = Iterate(*(jnp.asarray(state[f"it_{n}"]) for n in Iterate._fields))
        self.iter_num = int(state["iter_num"])
        self.theta_max = float(state["theta_max"])
        self.theta_min = float(state["theta_min"])
        self.filter._entries = list(state.get("filter_entries", []))
        if isinstance(strategy, _LowRankStrategy) and "bfgs_S" in state:
            strategy.bfgs = blr.BfgsState(
                S=jnp.asarray(state["bfgs_S"]),
                Y=jnp.asarray(state["bfgs_Y"]),
                active=jnp.asarray(state["bfgs_active"]),
                sigma=jnp.asarray(state["bfgs_sigma"]),
            )
        self.log.printf(
            Verbosity.SUMMARY, "restored checkpoint %s at iteration %d", path, self.iter_num
        )
        return it_curr, float(state["mu"])

    # -------------------------------------------------------------- helpers
    def _update_residual(self, it: Iterate, c, d_eval, grad_f, Jc, Jd, b: Bounds, mu):
        jacT_yc = Jc.T @ it.yc if Jc.shape[0] else jnp.zeros_like(it.x)
        jacT_yd = Jd.T @ it.yd if Jd.shape[0] else jnp.zeros_like(it.x)
        return res_mod.update_residual(
            it, c, d_eval, grad_f, jacT_yc, jacT_yd, self.nlp.crhs, b, mu, self.kappa_d
        )

    def _try_soc(
        self, strategy, it_curr, resid, b, mu, tau, c_curr, d_curr,
        c_trial, d_trial, theta_curr, theta_trial0, alpha_primal,
        phi_curr, grad_phi_dx,
    ):
        """Second-order correction (apply_second_order_correction,
        hiopAlgFilterIPM.cpp:2949). Returns the accepted trial tuple or None."""
        crhs = self.nlp.crhs
        c_soc = crhs - c_curr
        d_soc = it_curr.d - d_curr
        alpha_soc = alpha_primal
        theta_trial = theta_trial0
        theta_last = 0.0
        num_soc = 0
        while num_soc < self.max_soc_iter and (num_soc == 0 or theta_trial <= self.kappa_soc * theta_last):
            theta_last = theta_trial
            c_soc = alpha_soc * c_soc + (crhs - c_trial)
            d_soc = alpha_soc * d_soc + (it_curr.d - d_trial)
            res_soc = resid._replace(ryc=c_soc, ryd=d_soc)
            try:
                dir_soc = strategy.solve_rhs(res_soc, it_curr, b)
            except _StepComputationError:
                return None  # SOC is best-effort: fall back to plain backtracking
            ap, ad = it_mod.fraction_to_the_boundary(it_curr, dir_soc, tau, b)
            alpha_soc, alpha_dual_soc = float(ap), float(ad)
            it_trial = it_mod.take_step_primals(it_curr, dir_soc, alpha_soc)
            it_trial, _ = it_mod.compute_safe_slacks(it_trial, it_curr, b, mu)
            f_trial, c_trial, d_trial = self._eval_f_cons(it_trial.x)
            theta_trial = self._theta_onenorm(it_trial, c_trial, d_trial)
            phi_trial = self._logbar_f(it_trial, f_trial, b, mu)
            ls = self._accept_line_search_conditions(
                theta_curr, theta_trial, phi_curr, phi_trial, alpha_primal, grad_phi_dx
            )
            if ls > 0:
                return (
                    it_trial, f_trial, c_trial, d_trial, theta_trial,
                    phi_trial, alpha_soc, alpha_dual_soc, dir_soc, ls,
                )
            num_soc += 1
        return None

    #: soft-FR limits, hardwired as in the reference
    #: (solve_soft_feasibility_restoration, hiopAlgFilterIPM.cpp:3237-3238)
    MAX_SOFT_FR_ITER = 10
    KAPPA_F = 0.999

    def _solve_soft_fr(
        self, strategy, it_curr, resid, norms, dir_, b, mu, tau,
        c, d_eval, grad_f, Jc, Jd,
    ):
        """Soft feasibility restoration (solve_soft_feasibility_restoration,
        hiopAlgFilterIPM.cpp:3235): before posing the full FR NLP, re-use the
        *existing* KKT factorization to step from successive trial points,
        accepting when the one-norm barrier KKT error contracts by kappa_f
        and the trial is not in the filter.  Duals are updated inside (the
        reference calls dualsUpdate_->go with equal primal/dual steps).
        Returns (it_trial, f, c, d, theta, phi, alpha) or None."""
        o = self.opts
        kkt_err_curr = float(norms.bar_optim_onenorm + norms.nlp_feasib_onenorm)
        soft_dir = dir_
        it_trial = None
        f_trial = c_trial = d_trial = None
        for num_soft in range(self.MAX_SOFT_FR_ITER):
            if num_soft > 0:
                # re-evaluate at the rejected trial, re-solve with the same
                # factorization and the trial residual (cpp:3276-3282)
                f_trial, c_trial, d_trial = self._eval_f_cons(it_trial.x)
                res_trial, _ = self._update_residual(
                    it_trial, c_trial, d_trial, grad_f, Jc, Jd, b, mu
                )
                try:
                    soft_dir = strategy.solve_rhs(res_trial, it_curr, b)
                except _StepComputationError:
                    return None  # soft FR is best-effort: escalate to full FR
            ap, ad = it_mod.fraction_to_the_boundary(it_curr, soft_dir, tau, b)
            alpha = min(float(ap), float(ad))  # cpp:3288 equalizes the steps
            it_trial = it_mod.take_step_primals(it_curr, soft_dir, alpha)
            it_trial, _ = it_mod.compute_safe_slacks(it_trial, it_curr, b, mu)
            f_trial, c_trial, d_trial = self._eval_f_cons(it_trial.x)
            it_trial = it_mod.take_step_duals(it_trial, soft_dir, alpha, alpha)
            it_trial = it_mod.adjust_duals(it_trial, b, mu, self.kappa_Sigma)
            theta_trial = self._theta_onenorm(it_trial, c_trial, d_trial)
            if (
                o.str_("duals_update_type") == "lsq"
                and theta_trial <= o.num("recalc_lsq_duals_tol")
                and Jc.shape[0] + Jd.shape[0] > 0
            ):
                yc_new, yd_new = du.lsq_duals(
                    Jc, Jd, grad_f,
                    it_trial.zl, it_trial.zu, it_trial.vl, it_trial.vu,
                )
                it_trial = it_trial._replace(yc=yc_new, yd=yd_new)
            _, norms_t = self._update_residual(
                it_trial, c_trial, d_trial, grad_f, Jc, Jd, b, mu
            )
            kkt_err_trial = float(norms_t.bar_optim_onenorm + norms_t.nlp_feasib_onenorm)
            if kkt_err_trial > self.KAPPA_F * kkt_err_curr:
                return None  # insufficient KKT-error reduction (cpp:3340)
            phi_trial = self._logbar_f(it_trial, f_trial, b, mu)
            if self.filter.contains(float(theta_trial), float(phi_trial)):
                continue  # in the filter: reject, iterate again (cpp:3347)
            self._n_soft_fr = getattr(self, "_n_soft_fr", 0) + 1
            return it_trial, f_trial, c_trial, d_trial, theta_trial, phi_trial, alpha
        return None

    # ------------------------------------------------------ fused fast path
    #: fused-iteration mode for this solver class ('newton'/'qn'); None
    #: disables the fast path
    _fused_mode = None

    def run(self) -> SolverResult:
        o = self.opts
        profile_dir = o.str_("profile_dir")
        if profile_dir:
            # device-level tracing on top of the hiopRunStats-style phase
            # timers (SURVEY.md §5.1: "jax profiler + explicit phase
            # timers"); the trace is viewable with tensorboard/xprof
            import jax.profiler as _prof

            with _prof.trace(profile_dir):
                return self._run_dispatch()
        return self._run_dispatch()

    def _run_dispatch(self) -> SolverResult:
        o = self.opts
        jit_mode = o.str_("jit_mode")
        fusable = (
            self._fused_mode is not None
            and jit_mode in ("iteration", "solve")
            and getattr(self.nlp.problem, "jittable", False)
            and (self._fused_mode == "qn" or o.str_("KKTLinsys") in ("auto", "xdycyd"))
            and not getattr(self.nlp, "matrix_free", False)
            # per-iteration host-side debug/IO surfaces need the general loop
            and o.str_("deepchecks") == "no"
            and o.str_("write_kkt") == "no"
            and o.str_("time_kkt") == "off"
        )
        if fusable:
            fusable = self._fused_fits_memory()
        if fusable:
            try:
                if jit_mode == "solve" and not self._iterate_callback_overridden():
                    return self._run_fused_solve()
                return self._run_fused()
            except _FusedFallback as e:
                self.log.printf(
                    Verbosity.SUMMARY,
                    "fused iteration bailed out (%s); re-running the general path",
                    str(e),
                )
                # reset algorithm state and run the general loop
                self.filter = Filter()
                self._n_accep = 0
                self._err_nlp0 = None
                self.iter_num = 0
        return self._run_general()

    def _fused_fits_memory(self) -> bool:
        """Estimate the fused MDS program's HBM footprint and route
        oversize problems to the general host-loop tiers (which stay
        sparse/host-resident) instead of crashing in the compiler.
        With the operator-form mp path (triplet structure available,
        kkt/mds.py MdsSaddleDeviceMpOpFactors) the resident set is the f32
        saddle + factor plus the double-buffered dense state Jacobian —
        the f64 saddle is never materialized, so B=2048 ACOPF fits one
        chip (round 4's dense-mp path needed 34.8G vs 15.75G). The f64
        refactorization fallback adds two f64 (nd+m)^2 buffers and is
        gated separately (fused_newton mds_f64_fallback, same budget).
        Without the triplet structure the dense-mp estimate applies.
        Override with HIOP_TPU_FUSED_MEM_BUDGET (bytes)."""
        from hiop_tpu.formulation.mds import NlpMDS
        from hiop_tpu.kkt import mds as _kkt_mds

        nlp = self.nlp
        if not isinstance(nlp, NlpMDS):
            return True
        n_sad = nlp.n_dense + nlp.m_eq + nlp.m_ineq
        m = nlp.m_eq + nlp.m_ineq
        if (
            self.opts.str_("kkt_fact_dtype") == "float32"
            and _kkt_mds.mds_js_struct(nlp) is not None
        ):
            # f32 saddle + factor (+ transient), dense Jc state x2
            est = n_sad * n_sad * 12 + 2 * m * nlp.n * 8
        else:
            est = n_sad * n_sad * 20 + 2 * m * nlp.n_sparse * 8
        budget = float(os.environ.get("HIOP_TPU_FUSED_MEM_BUDGET", 12e9))
        if est > budget:
            self.log.printf(
                Verbosity.SUMMARY,
                "fused KKT footprint ~%.1f GB exceeds the %.1f GB budget; "
                "using the general loop's host tiers",
                est / 1e9, budget / 1e9,
            )
            return False
        return True

    def _iterate_callback_overridden(self) -> bool:
        """jit_mode=solve runs the whole solve in one XLA program, so a
        per-iteration user callback cannot be honored; detect overrides and
        route those problems through the per-iteration fused path."""
        from hiop_tpu.interface.base import NlpProblem

        cb = getattr(type(self.nlp.problem), "iterate_callback", None)
        return cb is not None and cb is not NlpProblem.iterate_callback

    def _apply_warm_start(self, it_curr, x0, d0, b):
        """User warm-start primal-dual point (startingProcedure warm path,
        hiopAlgFilterIPM.cpp:290+): project the user's point into the
        bounds, take its bound duals (floored away from zero) and
        constraint duals. Returns (it_curr, x0, d0, (f, c, d_eval) | None,
        warm_used); shared by the general and fused starting procedures."""
        if self.opts.str_("warm_start") != "yes":
            return it_curr, x0, d0, None, False
        warm = self.nlp.problem.get_warmstart_point()
        if warm is None:
            return it_curr, x0, d0, None, False
        wx, wzl, wzu, wyc, wyd, wd, wvl, wvu = (
            jnp.asarray(a) if a is not None else None for a in warm
        )
        x0, d0 = it_mod.starting_point_primal(
            wx, wd if wd is not None else d0, b, self.kappa1, self.kappa2
        )
        f, c, d_eval = self._eval_f_cons(x0)
        it_curr = it_curr._replace(
            x=x0, d=d0,
            zl=jnp.where(b.ixl == 1.0, jnp.maximum(wzl, 1e-12), 0.0),
            zu=jnp.where(b.ixu == 1.0, jnp.maximum(wzu, 1e-12), 0.0),
            vl=jnp.where(b.idl == 1.0, jnp.maximum(wvl, 1e-12), 0.0) if wvl is not None else it_curr.vl,
            vu=jnp.where(b.idu == 1.0, jnp.maximum(wvu, 1e-12), 0.0) if wvu is not None else it_curr.vu,
            yc=wyc if wyc is not None else it_curr.yc,
            yd=wyd if wyd is not None else it_curr.yd,
        )
        it_curr = it_mod.determine_slacks(it_curr, b)
        return it_curr, x0, d0, (f, c, d_eval), True

    def _fused_init(self):
        """Shared starting procedure for the fused paths: scaling setup,
        primal/slack initialization, LSQ duals, theta_min/max, the
        option-constant bundle, and the initial fused carry state."""
        from hiop_tpu.optimization import fused_newton as fn

        nlp = self.nlp
        b: Bounds = nlp.bounds
        o = self.opts
        x_user = nlp.get_starting_point()
        nlp.maybe_setup_scaling(x_user)
        f0, c0, d0_eval = self._eval_f_cons(x_user)
        x0, d0 = it_mod.starting_point_primal(x_user, d0_eval, b, self.kappa1, self.kappa2)
        f, c, d_eval = self._eval_f_cons(x0)
        n, m_eq, m_ineq = nlp.n, nlp.m_eq, nlp.m_ineq
        it_curr = Iterate(
            x=x0, d=d0,
            sxl=jnp.ones((n,), x0.dtype), sxu=jnp.ones((n,), x0.dtype),
            sdl=jnp.ones((m_ineq,), x0.dtype), sdu=jnp.ones((m_ineq,), x0.dtype),
            yc=jnp.zeros((m_eq,), x0.dtype), yd=jnp.zeros((m_ineq,), x0.dtype),
            zl=b.ixl * 1.0, zu=b.ixu * 1.0, vl=b.idl * 1.0, vu=b.idu * 1.0,
        )
        it_curr = it_mod.determine_slacks(it_curr, b)
        it_curr, x0, d0, fcd, warm_used = self._apply_warm_start(
            it_curr, x0, d0, b
        )
        if fcd is not None:
            f, c, d_eval = fcd
        grad_f = nlp.eval_grad_f(x0)
        Jc, Jd = nlp.eval_jac(x0)
        if not warm_used and o.str_("duals_init") == "lsq":
            yc, yd = du.initial_duals_lsq(
                Jc, Jd, grad_f, it_curr.zl, it_curr.zu, it_curr.vl, it_curr.vu,
                o.num("duals_lsq_ini_max"),
            )
            it_curr = it_curr._replace(yc=yc, yd=yd)

        theta0 = self._theta_onenorm(it_curr, c, d_eval)
        self.theta_max = self.theta_max_fact * max(1.0, theta0)
        self.theta_min = self.theta_min_fact * max(1.0, theta0)
        consts = dict(
            kappa_d=self.kappa_d, kappa_Sigma=self.kappa_Sigma,
            gamma_theta=self.gamma_theta,
            gamma_phi=self.gamma_phi, s_theta=self.s_theta, s_phi=self.s_phi,
            delta=self.delta, eta_phi=self.eta_phi,
            min_step_size=self.min_step_size, smax=self.smax,
            max_soc_iter=o.integer("max_soc_iter"),
            kappa_soc=o.num("kappa_soc"),
            # on-device inertia-revealing KKT for the fused modes (the
            # structurally-indefinite answer; see fused_newton)
            fused_ldl=o.str_("linear_solver_dense") == "ldl_nopiv",
            # mixed precision inside the fused program (kkt_fact_dtype=
            # float32): equilibrated f32 LDL^T + on-device f64 IR
            # certification, f64 refactorize only on IR failure — the
            # ReSolve pattern (RefactorizationSolver.hpp:74) fully on device
            fused_mp=o.str_("kkt_fact_dtype") == "float32",
            fused_ir_tol=min(o.num("ir_inner_tol_min"), 1e-9),
            # inertia-free curvature acceptance inside the fused mp ladder
            # (hiopFactAcceptorInertiaFreeDWD); accepts far smaller deltas
            # than exact pivot counting on degenerate problems
            fused_inertia_free=o.str_("fact_acceptor") == "inertia_free",
            neg_curv_fact=o.num("neg_curv_test_fact"),
        )
        if self._fused_mode == "qn":
            from hiop_tpu.optimization import hessian_lowrank as blr

            consts.update(
                sigma_update_strategy=o.str_("sigma_update_strategy"),
                sigma0=o.num("sigma0"),
                recalc_lsq_duals_tol=o.num("recalc_lsq_duals_tol"),
            )
            bfgs0 = blr.init_state(
                n, o.integer("secant_memory_len"), o.num("sigma0"),
                mesh=getattr(self.nlp, "_mesh", None),
                axis_name=getattr(self.nlp, "_mesh_axis", "n"),
            )
            state = fn.FusedQNState(
                it=it_curr, f=jnp.asarray(f), c=c, d=d_eval,
                grad=grad_f, Jc=Jc, Jd=Jd, bfgs=bfgs0,
                x_prev=it_curr.x, grad_prev=grad_f, Jc_prev=Jc, Jd_prev=Jd,
                have_prev=jnp.asarray(False),
            )
        else:
            state = fn.FusedState(it=it_curr, f=jnp.asarray(f), c=c, d=d_eval,
                                  grad=grad_f, Jc=Jc, Jd=Jd)
        return state, consts

    def _run_fused_solve(self) -> SolverResult:
        """``jit_mode=solve``: the whole IPM solve (outer mu loop, on-device
        filter, termination ladder) as ONE XLA program — a single dispatch
        and a single host sync per solve (fused_newton.build_fused_solve).
        Per-iteration summary lines are reconstructed from the returned
        history buffer, so the iteration table remains diffable against the
        other jit modes."""
        from hiop_tpu.optimization import fused_newton as fn

        nlp = self.nlp
        stats = nlp.runstats
        stats.tm_optimize_total.restart()
        mu = self.mu0
        tau = max(self.tau_min, 1.0 - mu)
        state, consts = self._fused_init()
        term = dict(
            eps_tol=self.eps_tol, rel_tol=self.rel_tol,
            accep_tol=self.accep_tol, accep_iters=self.accep_iters,
            max_iter=self.max_iter, kappa_eps=self.kappa_eps,
            kappa_mu=self.kappa_mu, theta_mu=self.theta_mu,
            tau_min=self.tau_min,
            comp_tol_scaled=self.comp_tol / self.nlp.scale_obj,
        )
        solve = fn.build_fused_solve(nlp, consts, term, mode=self._fused_mode)
        # chain BOUNDED dispatches: this environment's TPU relay kills very
        # long single dispatches (a ~10-minute fused while_loop crashed the
        # worker), so the on-device loop pauses every chunk iterations and
        # resumes from the carried state — one extra scalar sync per chunk
        chunk = int(os.environ.get("HIOP_TPU_FUSED_CHUNK", "60"))
        carry = None
        it_stop = chunk
        while True:
            state, mu_dev, it_num, st, err_nlp, hist, carry = solve(
                state, mu, tau, self.theta_min, self.theta_max,
                self.max_iter, carry_in=carry, it_stop=it_stop,
            )
            st = int(jax.device_get(st))
            if st != 0:
                break
            it_stop = int(it_num) + chunk
        it_num = int(it_num)
        hist = np.asarray(hist)
        mu = float(mu_dev)
        err_nlp = float(err_nlp)

        # replay the iteration table from the history buffer
        for i in range(min(it_num + 1, hist.shape[0])):
            self.iter_num = i
            (f_i, feas_i, opt_i, mu_i, adu_i, apr_i, lsn_i, lss_i,
             _err_i, soc_i, _f32_i, _dw_i, _nref_i, _ir_i, _socn_i) = hist[i]
            self._output_iteration(
                f_i, feas_i, opt_i, mu_i, adu_i, apr_i,
                int(lsn_i), int(lss_i) if i else -1, use_soc=int(soc_i),
            )
        self._err_nlp0 = float(hist[0, fn.HIST_ERR])
        self.iter_num = it_num
        stats.n_iters = it_num
        #: full per-iteration history (HIST_COLS incl. delta_w, mp_f32) —
        #: kept for diagnosis; rows past min(it_num, HIST_CAP) are undefined
        self._last_fused_hist = hist
        # per-iteration f32-vs-f64 factorization accounting from the history
        # buffer (runstats f32-fraction parity with the host loop's
        # kkt.n_fact_* counters; hist rows past it_num are undefined)
        if it_num > 0 and consts.get("fused_mp"):
            used = hist[:it_num, 10]
            stats.kkt.n_fact_total += int(used.shape[0])
            stats.kkt.n_fact_f32 += int(used.sum())

        if st in (6, 7):
            # hand the final fused iterate to the general loop (resume, not
            # restart — see _run_loop's handoff block)
            core = state[1] if getattr(nlp, "parametric", False) else state
            self._fused_handoff = (core.it, mu, it_num)
        if st == 6:
            raise _FusedFallback("factorization needs regularization")
        if st == 7:
            raise _FusedFallback("line search rejected (SOC/FR needed)")
        self.solver_status = {
            1: SolveStatus.Solve_Success,
            2: SolveStatus.Solve_Success_RelTol,
            3: SolveStatus.Solve_Acceptable_Level,
            4: SolveStatus.Max_Iter_Exceeded,
            5: SolveStatus.Iterates_Diverging,
        }.get(st, SolveStatus.Unknown)

        obj = nlp.unscaled_obj(float(state.f))
        stats.tm_optimize_total.stop()
        nlp.user_callback_solution(
            self.solver_status, state.it.x, state.it.zl, state.it.zu,
            jnp.concatenate([state.c, state.d]) if nlp.m else state.c,
            (state.it.yc, state.it.yd), obj,
        )
        self.log.printf(
            Verbosity.SUMMARY,
            "Solver status: %s, objective %.12e, iterations %d (fused solve)",
            self.solver_status.name, obj, self.iter_num,
        )
        return SolverResult(
            status=self.solver_status, x=np.asarray(state.it.x), obj=obj,
            iterations=self.iter_num, err_nlp=err_nlp, mu=mu,
        )

    def _run_fused(self) -> SolverResult:
        """One jitted XLA computation per IPM iteration (fused_newton.py);
        O(1) per-iteration host decisions with a single scalar sync."""
        from hiop_tpu.optimization import fused_newton as fn

        nlp = self.nlp
        b: Bounds = nlp.bounds
        o = self.opts
        stats = nlp.runstats
        stats.tm_optimize_total.restart()
        mu = self.mu0
        tau = max(self.tau_min, 1.0 - mu)

        state, consts = self._fused_init()
        if self._fused_mode == "qn":
            step = fn.build_fused_step(nlp, consts, mode="qn")
        else:
            step = fn.build_fused_step(nlp, consts)

        filt = np.full((fn.FILTER_CAP, 2), np.inf)
        filt[0] = (self.theta_max, -np.inf)
        filt_len = 1
        self.solver_status = SolveStatus.NlpSolve_Pending
        self.iter_num = 0
        printed_header = False

        dw_last = 0.0
        while True:
            new_state, s, dw_next = step(
                state, mu, tau, jnp.asarray(filt), filt_len, self.theta_min,
                dw_last,
            )
            sh = jax.device_get(s)
            err_nlp = float(sh.err_nlp)
            err_log = float(sh.err_log)
            if self._err_nlp0 is None:
                self._err_nlp0 = err_nlp
            self._output_iteration(
                float(sh.f), float(sh.nlp_feasib), float(sh.nlp_optim), mu,
                float(sh.alpha_dual), float(sh.alpha_primal),
                int(sh.ls_count), int(sh.ls_status) if self.iter_num else -1,
                use_soc=int(sh.use_soc),
            )
            # user callback (coarse: scalars only; arrays on request)
            info = IterateCallbackInfo(
                iter=self.iter_num, obj_value=nlp.unscaled_obj(float(sh.f)),
                logbar_obj_value=float(sh.phi), x=state.it.x,
                z_L=state.it.zl, z_U=state.it.zu, s=state.it.d, g=state.c,
                yc=state.it.yc, yd=state.it.yd,
                inf_pr=float(sh.nlp_feasib), inf_du=float(sh.nlp_optim),
                onenorm_pr=float(sh.theta), mu=mu,
                alpha_du=float(sh.alpha_dual), alpha_pr=float(sh.alpha_primal),
                ls_trials=int(sh.ls_count),
            )
            if not nlp.user_callback_iterate(info):
                self.solver_status = SolveStatus.User_Stopped
                break

            term = self._check_termination(err_nlp, s)
            if term is not None:
                self.solver_status = term
                break

            if not bool(sh.fact_ok):
                core = state[1] if getattr(nlp, "parametric", False) else state
                self._fused_handoff = (core.it, mu, self.iter_num)
                raise _FusedFallback("factorization needs regularization")
            if int(sh.ls_status) == 0:
                core = state[1] if getattr(nlp, "parametric", False) else state
                self._fused_handoff = (core.it, mu, self.iter_num)
                raise _FusedFallback("line search rejected (SOC/FR needed)")

            # mu schedule (single reduction per iteration; catch-up happens
            # across consecutive iterations)
            if err_log <= self.kappa_eps * mu:
                changed, mu, tau = self._update_mu(mu)
                if changed:
                    filt[0] = (self.theta_max, -np.inf)
                    filt_len = 1
            if bool(sh.filter_add) and filt_len < fn.FILTER_CAP:
                filt[filt_len] = (float(sh.theta_add), float(sh.phi_add))
                filt_len += 1

            state = new_state
            dw_last = dw_next
            self.iter_num += 1
            stats.n_iters = self.iter_num
            if consts.get("fused_mp"):
                stats.kkt.n_fact_total += 1
                stats.kkt.n_fact_f32 += int(bool(sh.mp_f32))

        obj = nlp.unscaled_obj(float(state.f))
        stats.tm_optimize_total.stop()
        nlp.user_callback_solution(
            self.solver_status, state.it.x, state.it.zl, state.it.zu,
            jnp.concatenate([state.c, state.d]) if nlp.m else state.c,
            (state.it.yc, state.it.yd), obj,
        )
        self.log.printf(
            Verbosity.SUMMARY,
            "Solver status: %s, objective %.12e, iterations %d (fused)",
            self.solver_status.name, obj, self.iter_num,
        )
        return SolverResult(
            status=self.solver_status, x=np.asarray(state.it.x), obj=obj,
            iterations=self.iter_num, err_nlp=float(err_nlp), mu=mu,
        )


class FilterIPMQuasiNewton(FilterIPMBase):
    """IPM with limited-memory BFGS Hessian for dense-constrained NLPs
    (hiopAlgFilterIPMQuasiNewton, hpp:349). Always runs in "safe mode"
    (cpp:1085); the KKT system is the low-rank Schur solve."""

    _fused_mode = "qn"

    def _make_strategy(self):
        return _LowRankStrategy(self.nlp)


class FilterIPMNewton(FilterIPMBase):
    """IPM with exact second order (hiopAlgFilterIPMNewton, hpp:446).

    The KKT class ladder (decideAndCreateLinearSystem, cpp:1848-1901) picks
    the dense XDYcYd system here; the formulation provides the Hessian
    (dense from autodiff, assembled from triplets for sparse problems)."""

    _fused_mode = "newton"

    def _make_strategy(self):
        from hiop_tpu.formulation.mds import NlpMDS
        from hiop_tpu.formulation.sparse import NlpSparse

        if isinstance(self.nlp, NlpMDS):
            return _MdsStrategy(self.nlp, self.log, self.nlp.runstats)
        if (
            isinstance(self.nlp, NlpSparse)
            and self.opts.str_("KKTLinsys") == "condensed"
            and self.nlp.matrix_free
        ):
            return _CondensedMatfreeStrategy(self.nlp, self.log, self.nlp.runstats)
        if (
            isinstance(self.nlp, NlpSparse)
            and self.opts.str_("KKTLinsys") == "condensed"
            and self.nlp.m_eq == 0
            # replace dense materialization above the densification
            # threshold, or on request — the reference's CSR condensed
            # class (hiopKKTLinSysSparseCondensed.hpp:105)
            and (
                self.nlp.n >= 2000
                or self.opts.str_("linear_solver_sparse") == "device_ldl"
            )
        ):
            try:
                return _CondensedSparseDeviceStrategy(
                    self.nlp, self.log, self.nlp.runstats
                )
            except ValueError as e:
                # oversize pair program etc. — fall through to dense
                self.log.printf(
                    Verbosity.SCALARS,
                    "sparse condensed device path unavailable (%s); using "
                    "the dense condensed realization", e,
                )
        if isinstance(self.nlp, NlpSparse) and self.opts.str_("KKTLinsys") == "full":
            return _SparseFullStrategy(self.nlp, self.log, self.nlp.runstats)
        if isinstance(self.nlp, NlpSparse) and self.opts.str_("KKTLinsys") in (
            "auto", "xdycyd", "xycyd",
        ):
            from hiop_tpu.linalg import solver_registry

            ls = self.opts.str_("linear_solver_sparse")
            if ls != "auto" and solver_registry.has_solver(ls):
                return _SparseDirectStrategy(self.nlp, self.log, self.nlp.runstats)
            # auto: above this size the dense XDYcYd assembly/factorization
            # is O(N^2)/O(N^3) while the sparse-direct path is fill-limited
            # with supernodal BLAS3 + diag(U) pivot-sign inertia (the splu
            # backend); mirrors decideAndCreateLinearSystem picking the
            # sparse KKT class for hiopNlpSparse (hiopKKTLinSysSparse.cpp)
            if ls == "auto" and self.nlp.n + self.nlp.m_eq + self.nlp.m_ineq >= 2000:
                return _SparseDirectStrategy(self.nlp, self.log, self.nlp.runstats)
        return _NewtonDenseStrategy(self.nlp, self.log, self.nlp.runstats)


