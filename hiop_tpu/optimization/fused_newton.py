"""Fully-jitted IPM iteration (the ``jit_mode=iteration`` fast path).

The host-orchestrated loop in filter_ipm.py dispatches ~30 device kernels
and synchronizes several scalars per iteration — right for callback-style
problems, but dispatch-bound for jittable ones. This module compiles ONE
XLA computation per IPM iteration for the Newton quick path:

  evals -> Hessian -> factorize (Cholesky-Schur) -> direction -> recovery
  -> fraction-to-the-boundary -> backtracking filter line search
  (lax.while_loop, filter as a fixed-size on-device buffer) -> linear dual
  update -> safeguards -> next residual/errors

Everything data-dependent that the reference keeps in C++ control flow
(line-search trials, acceptance tests) becomes lax control flow; only the
O(1) per-iteration decisions (mu schedule, filter augmentation, termination,
fallbacks) stay host-side, reading a single small scalar bundle per
iteration.

Scope: jittable problems (AutoDiff / jittable sparse-dense) on the dense
Newton quick path with the linear dual update. Second-order correction runs
INSIDE the fused step (a lax.while_loop re-solving on the live
factorization). Any iteration the fused step cannot certify (failed
factorization, line search rejected even after SOC) aborts fused mode and
the solve falls back to the general loop — correctness never depends on
the fast path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from hiop_tpu.optimization import iterate as it_mod
from hiop_tpu.optimization import residual as res_mod
from hiop_tpu.optimization.iterate import Bounds, Iterate

FILTER_CAP = 128
MAX_LS = 30

#: columns of the per-iteration history buffer returned by the fused solve
#: (jit_mode=solve): f, nlp_feasib, nlp_optim, mu, alpha_du, alpha_pr,
#: ls_count, ls_status, err_nlp, use_soc, mp_f32 (iteration's factorization
#: stayed in certified f32), delta_w (accepted primal regularization),
#: n_refact (regularization-ladder refactorizations), ir_primary (IR/FGMRES
#: iterations on the primary solve), soc_rounds (second-order-correction
#: re-solves) — the last three are the fused-program per-phase counters
#: (hiopRunKKTSolStats parity, hiopRunStats.hpp:65)
HIST_COLS = 15
HIST_ERR = 8
#: static cap on the fused solve's history buffer: the executable stays
#: IDENTICAL for every max_iter (max_iter enters the termination test as a
#: traced scalar), so changing max_iter costs no recompile — on this
#: environment's remote-compile relay a fresh fused B=512 program is
#: minutes. Runs past the cap keep solving; only their last-row logging
#: collapses.
HIST_CAP = 1024


class FusedScalars(NamedTuple):
    """Per-iteration scalar bundle returned to the host (one sync)."""

    f: jax.Array
    err_nlp: jax.Array
    err_log: jax.Array
    nlp_optim: jax.Array
    nlp_feasib: jax.Array
    theta: jax.Array
    phi: jax.Array
    alpha_primal: jax.Array
    alpha_dual: jax.Array
    ls_count: jax.Array
    ls_status: jax.Array     # 0 rejected (fallback), 1/2/3 accepted kinds
    use_soc: jax.Array       # bool: step accepted via second-order correction
    fact_ok: jax.Array
    filter_add: jax.Array    # bool: host should append (theta, phi) trial
    theta_add: jax.Array
    phi_add: jax.Array
    mp_f32: jax.Array        # bool: factorization used certified f32 (mp)
    delta_w: jax.Array       # accepted primal regularization this iteration
    n_refact: jax.Array      # regularization-ladder refactorization count
    ir_primary: jax.Array    # IR/FGMRES iterations on the primary solve
    soc_rounds: jax.Array    # second-order-correction re-solve count


class _FusedLdlFactors(NamedTuple):
    """All-array LDL factors for the fused ladder (lax.while_loop-safe):
    `ok` folds the pivot-sign inertia acceptance (n_neg == m_eq + m_ineq)
    into the regularization loop's retry condition."""
    L: jax.Array
    d: jax.Array
    ok: jax.Array


class FusedState(NamedTuple):
    it: Iterate
    f: jax.Array
    c: jax.Array
    d: jax.Array
    grad: jax.Array
    Jc: jax.Array
    Jd: jax.Array


class FusedQNState(NamedTuple):
    """Fused quasi-Newton carry: the Newton state + BFGS memory + the
    previous accepted point's derivatives (for the secant update)."""

    it: Iterate
    f: jax.Array
    c: jax.Array
    d: jax.Array
    grad: jax.Array
    Jc: jax.Array
    Jd: jax.Array
    bfgs: "object"          # hessian_lowrank.BfgsState
    x_prev: jax.Array
    grad_prev: jax.Array
    Jc_prev: jax.Array
    Jd_prev: jax.Array
    have_prev: jax.Array    # bool: secant update valid


def build_fused_step(nlp, consts, mode: str = "newton"):
    """Returns a jitted step(state, mu, tau, filt, filt_len, theta_min,
    dw_last) -> (new_state, FusedScalars, dw_next), where dw_last/dw_next
    carry the regularization ladder's last-successful delta across
    iterations. `nlp` must have jittable evaluations.
    mode='newton' uses the exact-Hessian quick path; mode='qn' carries the
    compact-BFGS memory in the state (FusedQNState) with the low-rank Schur
    direction and the LSQ dual update — and because every op in the program
    is sharding-transparent, running it on mesh-sharded inputs executes the
    whole distributed iteration (secant update, psum'd Gram matrices,
    replicated Schur solve, line search) as ONE collective XLA program.

    The compiled step is cached on the formulation (keyed on the
    option-constant tuple) so repeated solves reuse the XLA executable —
    a recompile costs minutes through this environment's compile relay."""
    key = (mode, tuple(sorted(consts.items())))
    cached = getattr(nlp, "_fused_step_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    step = _build_fused_step_uncached(nlp, consts, mode)
    nlp._fused_step_cache = (key, step)
    return step


def build_fused_solve(nlp, consts, term, mode: str = "newton"):
    """The ``jit_mode=solve`` path: the ENTIRE IPM solve as ONE XLA program.

    Wraps the fused per-iteration step in a ``lax.while_loop`` that also
    carries the outer-loop state the host manages in ``jit_mode=iteration``
    — the mu/tau schedule (update_log_barrier_params), the filter buffer
    with reset-on-mu-change and trial-point augmentation, the acceptable-
    tolerance counter, and every termination test of
    ``FilterIPMBase._check_termination``. One dispatch and one host sync
    per *solve* instead of per iteration: on this environment's
    remote-relay TPU that removes the dominant per-iteration overhead, and
    it is the idiomatic XLA formulation of the reference's C++ run loop
    (hiopAlgFilterIPM.cpp:2101+).

    ``term`` carries the termination/schedule scalars:
    eps_tol, rel_tol, accep_tol, accep_iters, max_iter, kappa_eps,
    kappa_mu, theta_mu, tau_min, comp_tol_scaled, diverg_tol.

    Returns ``solve(state0, mu0, tau0, theta_min, theta_max, max_iter,
    carry_in=None, it_stop=None)`` ->
    ``(state, mu, iter_num, status_code, err_nlp, hist, carry)`` where
    ``status_code`` is 1 Solve_Success, 2 Solve_Success_RelTol,
    3 Solve_Acceptable_Level, 4 Max_Iter_Exceeded, 5 Iterates_Diverging,
    6/7 needs-host (failed factorization / rejected line search — the
    caller falls back to the general loop), and ``hist`` is an
    (max_iter+1, HIST_COLS) per-iteration table for logging (rows past
    ``iter_num`` are undefined).
    """
    # max_iter is NOT part of the cache key (nor of the compiled program):
    # it enters as a traced argument of the jitted solve
    key = (
        mode,
        tuple(sorted(consts.items())),
        tuple(sorted((k, v) for k, v in term.items() if k != "max_iter")),
    )
    cached = getattr(nlp, "_fused_solve_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]

    raw_step = _build_fused_step_uncached(nlp, consts, mode)
    eps_tol = term["eps_tol"]
    rel_tol = term["rel_tol"]
    accep_tol = term["accep_tol"]
    accep_iters = int(term["accep_iters"])
    kappa_eps = term["kappa_eps"]
    kappa_mu = term["kappa_mu"]
    theta_mu = term["theta_mu"]
    tau_min = term["tau_min"]
    comp_tol_scaled = term["comp_tol_scaled"]
    diverg_tol = term.get("diverg_tol", 1e20)
    n_hist = HIST_CAP

    def _solve_core(carry0, theta_min, max_iter, it_stop):
        dtype = carry0[1].dtype

        def cond(carry):
            return (carry[-1] == 0) & (
                carry[5] < jnp.asarray(it_stop, jnp.int32)
            )

        def body(carry):
            (state, mu, tau, filt, filt_len, it_num, err0, n_accep, hist,
             dw_last, _st) = carry
            new_state, s, dw_next = raw_step(
                state, mu, tau, filt, filt_len, theta_min, dw_last
            )
            row = jnp.stack(
                [
                    s.f.astype(dtype),
                    s.nlp_feasib.astype(dtype),
                    s.nlp_optim.astype(dtype),
                    mu.astype(dtype),
                    s.alpha_dual.astype(dtype),
                    s.alpha_primal.astype(dtype),
                    s.ls_count.astype(dtype),
                    s.ls_status.astype(dtype),
                    s.err_nlp.astype(dtype),
                    s.use_soc.astype(dtype),
                    s.mp_f32.astype(dtype),
                    s.delta_w.astype(dtype),
                    s.n_refact.astype(dtype),
                    s.ir_primary.astype(dtype),
                    s.soc_rounds.astype(dtype),
                ]
            )
            zero = jnp.asarray(0, jnp.int32)
            hist = jax.lax.dynamic_update_slice(
                hist, row[None, :], (jnp.minimum(it_num, n_hist - 1), zero)
            )
            err0 = jnp.where(it_num == 0, s.err_nlp, err0)

            # termination ladder (FilterIPMBase._check_termination order)
            acc = s.err_nlp <= accep_tol
            n_accep = jnp.where(acc, n_accep + 1, 0)
            st = jnp.asarray(0, jnp.int32)

            def claim(st, cond_, code):
                return jnp.where((st == 0) & cond_, jnp.asarray(code, jnp.int32), st)

            st = claim(st, s.err_nlp <= eps_tol, 1)
            if rel_tol > 0:
                st = claim(st, s.err_nlp <= rel_tol * err0, 2)
            st = claim(st, acc & (n_accep >= accep_iters), 3)
            st = claim(st, it_num >= jnp.asarray(max_iter, jnp.int32), 4)
            st = claim(st, s.nlp_feasib > diverg_tol, 5)
            # needs-host exits (host falls back to the general loop)
            st = claim(st, ~s.fact_ok, 6)
            st = claim(st, s.ls_status == 0, 7)
            running = st == 0

            # mu/tau schedule + filter reset (update_log_barrier_params)
            new_mu = jnp.maximum(0.0, jnp.minimum(kappa_mu * mu, mu**theta_mu))
            new_mu = jnp.maximum(new_mu, min(eps_tol, comp_tol_scaled) / 11.0)
            mu_changed = (s.err_log <= kappa_eps * mu) & (
                jnp.abs(new_mu - mu) >= 1e-16
            )
            do_mu = running & mu_changed
            mu = jnp.where(do_mu, new_mu, mu)
            tau = jnp.where(do_mu, jnp.maximum(tau_min, 1.0 - new_mu), tau)
            filt_len = jnp.where(do_mu, 1, filt_len)

            # filter augmentation with the trial point
            do_add = running & s.filter_add & (filt_len < FILTER_CAP)
            add_row = jnp.stack([s.theta_add, s.phi_add]).astype(dtype)
            filt_upd = jax.lax.dynamic_update_slice(
                filt, add_row[None, :], (jnp.minimum(filt_len, FILTER_CAP - 1), zero)
            )
            filt = jnp.where(do_add, filt_upd, filt)
            filt_len = jnp.where(do_add, filt_len + 1, filt_len)

            # advance only while running (on exit the result is the
            # pre-step state, matching the host loop's break-before-assign)
            state = jax.tree.map(
                lambda new, old: jnp.where(running, new, old), new_state, state
            )
            dw_last = jnp.where(running, dw_next, dw_last)
            it_num = jnp.where(running, it_num + 1, it_num)
            return (state, mu, tau, filt, filt_len, it_num, err0, n_accep,
                    hist, dw_last, st)

        return jax.lax.while_loop(cond, body, carry0)

    solve_core = jax.jit(_solve_core)

    def solve(state0, mu0, tau0, theta_min, theta_max, max_iter,
              carry_in=None, it_stop=None):
        """Run the fused loop until termination or ``it_stop`` iterations.

        ``carry_in`` (the previous call's full carry, 7th return value)
        resumes a paused solve; ``it_stop`` bounds the iterations of THIS
        dispatch — the host chains bounded dispatches because this
        environment's TPU relay kills very long single dispatches (a
        ~10-minute while_loop crashed the worker).  The initial carry is
        built eagerly OUTSIDE the jitted core so the resume path reuses
        the same compiled executable.  st == 0 on return means 'not
        terminated — call again with carry_in'."""
        if carry_in is not None:
            carry0 = carry_in
            dtype = carry0[1].dtype
        else:
            core0 = state0[1] if getattr(nlp, "parametric", False) else state0
            dtype = core0.it.x.dtype
            filt0 = jnp.full((FILTER_CAP, 2), jnp.inf, dtype)
            filt0 = filt0.at[0, 1].set(-jnp.inf)
            filt0 = filt0.at[0, 0].set(jnp.asarray(theta_max, dtype))
            hist0 = jnp.zeros((n_hist, HIST_COLS), dtype)
            carry0 = (
                state0,
                jnp.asarray(mu0, dtype),
                jnp.asarray(tau0, dtype),
                filt0,
                jnp.asarray(1, jnp.int32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(jnp.inf, dtype),
                jnp.asarray(0, jnp.int32),
                hist0,
                jnp.asarray(0.0, dtype),
                jnp.asarray(0, jnp.int32),
            )
        if it_stop is None:
            it_stop = np.iinfo(np.int32).max
        final = solve_core(carry0, theta_min, max_iter, it_stop)
        (state, mu, _tau, _filt, _flen, it_num, _err0, _nacc, hist,
         _dw, st) = final
        err_nlp = hist[jnp.minimum(it_num, n_hist - 1), HIST_ERR]
        return state, mu, it_num, st, err_nlp, hist, final

    nlp._fused_solve_cache = (key, solve)
    return solve


def _build_fused_step_uncached(nlp, consts, mode: str = "newton"):
    b: Bounds = nlp.bounds
    crhs = nlp.crhs
    kappa_d = consts["kappa_d"]
    kappa_sigma = consts["kappa_Sigma"]
    gamma_theta = consts["gamma_theta"]
    gamma_phi = consts["gamma_phi"]
    s_theta = consts["s_theta"]
    s_phi = consts["s_phi"]
    delta = consts["delta"]
    eta_phi = consts["eta_phi"]
    min_step = consts["min_step_size"]
    smax = consts["smax"]
    n, m = nlp.n, nlp.m

    # parametric problems (ParametricDenseNlp, batch_solve.py) carry a
    # scenario parameter th through the fused state; every evaluation takes
    # it, so the whole step (and the whole solve) can be vmapped over th
    parametric = getattr(nlp, "parametric", False)

    def evals(x, th=None):
        if parametric:
            f = nlp.eval_f(x, th)
            c, d = nlp.eval_cons(x, th)
        else:
            f = nlp.eval_f(x)
            c, d = nlp.eval_cons(x)
        return f, c, d

    def derivs(x, th=None):
        if parametric:
            return nlp.eval_grad_f(x, th), *nlp.eval_jac(x, th)
        return nlp.eval_grad_f(x), *nlp.eval_jac(x)

    from hiop_tpu.formulation.mds import NlpMDS

    is_mds = isinstance(nlp, NlpMDS)
    ns = nlp.n_sparse if is_mds else 0

    # operator-form mixed-precision plan (MDS only): precompute the sparse
    # block's triplet structure and same-column Schur pairs ONCE at build
    # time; the step then assembles the f32 saddle by scatter and keeps the
    # f64 IR operator in triplet/operator form (kkt/mds.py
    # MdsSaddleDeviceMpOpFactors — the ReSolve no-dense-copy IR pattern).
    # The f64 refactorization fallback is gated STATICALLY on the memory
    # budget: where its two extra f64 (nd+m)^2 buffers do not fit (B=2048
    # ACOPF), certification failures exit to the host loop instead of
    # compiling an OOM program.
    js_struct = None
    mds_f64_fallback = True
    if is_mds and bool(consts.get("fused_mp", False)):
        import os as _os

        from hiop_tpu.kkt import mds as _kkt_mds

        js_struct = _kkt_mds.mds_js_struct(nlp)
        _nsad = nlp.n_dense + nlp.m_eq + nlp.m_ineq
        _budget = float(_os.environ.get("HIOP_TPU_FUSED_MEM_BUDGET", 12e9))
        _base = 8 * _nsad * _nsad + 16 * (nlp.m_eq + nlp.m_ineq) * nlp.n
        mds_f64_fallback = (_base + 32 * _nsad * _nsad) < _budget

    def hess(x, yc, yd, th=None):
        if parametric:
            return nlp.eval_hess(x, 1.0, yc, yd, th)
        return nlp.eval_hess(x, 1.0, yc, yd)

    def logbar_phi(it, f, mu):
        val = f - mu * it_mod.eval_logbar(it, b)
        return val + it_mod.linear_damping_term(it, b, mu, kappa_d)

    def theta_of(it, c, d):
        return jnp.sum(jnp.abs(crhs - c)) + jnp.sum(jnp.abs(it.d - d))

    def filter_contains(filt, filt_len, theta, phi):
        idx = jnp.arange(FILTER_CAP)
        valid = idx < filt_len
        dom = (theta >= filt[:, 0]) & (phi >= filt[:, 1]) & valid
        return jnp.any(dom)

    is_qn = mode == "qn"
    if is_qn:
        from hiop_tpu.optimization import hessian_lowrank as blr

        sigma_strategy = consts.get("sigma_update_strategy", "sty")
        sigma0 = consts.get("sigma0", 1.0)
        recalc_lsq_tol = consts.get("recalc_lsq_duals_tol", 1e-6)

    def step(state, mu, tau, filt, filt_len, theta_min, dw_last):
        th = None
        if parametric:
            th, state = state
        if is_qn:
            (it, f, c, d_eval, grad, Jc, Jd, bfgs,
             x_prev, grad_prev, Jc_prev, Jd_prev, have_prev) = state
            # secant update at iteration start (hiopHessianLowRank::update)
            s_new = it.x - x_prev
            y_new = grad - grad_prev
            if m:
                y_new = y_new + (Jc - Jc_prev).T @ it.yc + (Jd - Jd_prev).T @ it.yd
            bfgs_upd = blr.update(bfgs, s_new, y_new, sigma0, strategy=sigma_strategy)
            bfgs = jax.tree.map(
                lambda u, o: jnp.where(have_prev, u, o), bfgs_upd, bfgs
            )
        else:
            it, f, c, d_eval, grad, Jc, Jd = state

        # residual + errors at the current point. For MDS problems with the
        # triplet structure, J^T y runs through the sparse-block triplets +
        # the small dense border instead of a dense (m, n) dot_general —
        # the f64-emulated dense matvec's hi/lo operand splits alone exceed
        # HBM at B=2048 ACOPF (Jc is 3.1 GB f64; measured compile OOM).
        if is_mds and js_struct is not None and m:
            _jsr, _jsc, _ = js_struct
            _jv = []
            if nlp.m_eq:
                _jv.append(Jc[nlp.jac_sp_eq_rows, nlp.jac_sp_eq_cols])
            if nlp.m_ineq:
                _jv.append(Jd[nlp.jac_sp_in_rows, nlp.jac_sp_in_cols])
            _jv = jnp.concatenate(_jv) if _jv else jnp.zeros((0,), it.x.dtype)

            def _jacT(y_stacked, Jdense):
                sp = (
                    jnp.zeros((ns,), it.x.dtype)
                    .at[_jsc].add(_jv * y_stacked[_jsr])
                )
                return jnp.concatenate([sp, Jdense])

            _y_st = jnp.concatenate([
                it.yc,
                jnp.zeros((nlp.m_ineq,), it.x.dtype),
            ])
            jacT_yc = _jacT(_y_st, Jc[:, ns:].T @ it.yc)
            _y_st_d = jnp.concatenate([
                jnp.zeros((nlp.m_eq,), it.x.dtype),
                it.yd,
            ])
            jacT_yd = _jacT(_y_st_d, Jd[:, ns:].T @ it.yd)
        else:
            jacT_yc = Jc.T @ it.yc if m else jnp.zeros_like(it.x)
            jacT_yd = Jd.T @ it.yd if m else jnp.zeros_like(it.x)
        resid, norms = res_mod.update_residual(
            it, c, d_eval, grad, jacT_yc, jacT_yd, crhs, b, mu, kappa_d
        )
        eq1, bnd1 = it_mod.norm_one_of_duals(it)
        sd = jnp.minimum(jnp.maximum(smax, (bnd1 + eq1) / max(n + m, 1)) / smax, 1e8)
        sc = jnp.minimum(jnp.maximum(smax, bnd1 / n) / smax, 1e8)
        err_nlp = jnp.maximum(
            norms.nlp_optim / sd,
            jnp.maximum(norms.cons_violation, norms.nlp_complem / sc),
        )
        err_log = jnp.maximum(
            norms.bar_optim / sd,
            jnp.maximum(norms.cons_violation, norms.bar_complem / sc),
        )

        # direction: quick Cholesky-Schur with an ON-DEVICE regularization
        # ladder (the reference's factorizeWithCurvCheck + hiopPDPerturbation
        # retry loop, hiopKKTLinSys.cpp): a failed Cholesky retries with
        # delta_w = delta_0_bar escalating by kappa_w_plus_bar and dual
        # regularization delta_c_bar * mu^kappa_c, inside a lax.while_loop —
        # no host round trip. Only if the ladder is exhausted does the step
        # report fact_ok=False and the host fall back. For MDS formulations
        # the sparse-diagonal elimination + dense-block Cholesky (kkt/mds.py)
        # replaces the dense quick path.
        # Caveat: Cholesky acceptance requires FULL-space PD, so on
        # structurally indefinite problems (see examples/acopf_mds.py) the
        # ladder converges with delta_w = O(1) every iteration and the solve
        # creeps; the host-loop strategies detect this and escalate to an
        # inertia-revealing tier (_maybe_escalate_chronic, filter_ipm.py) —
        # for such problems use the default jit_mode=kernels.
        delta0 = consts.get("delta_0_bar", 1e-4)
        kappa_plus_bar = consts.get("kappa_w_plus_bar", 100.0)
        kappa_plus = consts.get("kappa_w_plus", 8.0)
        kappa_minus = consts.get("kappa_w_minus", 1.0 / 3.0)
        delta_w_min = consts.get("delta_w_min_bar", 1e-20)
        delta_c_bar = consts.get("delta_c_bar", 1e-8)
        kappa_c = consts.get("kappa_c", 0.25)
        MAX_REG = 10

        def fact_with_reg(fact_fn, dtype, dw_last):
            """On-device regularization ladder with the reference's FULL
            hiopPDPerturbation curve (hiopPDPerturbation.cpp): try delta=0;
            on wrong inertia start from delta_0_bar the first time EVER,
            afterwards from kappa_w_minus * last-successful delta (the
            cross-iteration memory that keeps delta near the minimal
            needed), growing by kappa_w_plus (x8) — or kappa_w_plus_bar
            (x100) only before any success.  Without the memory the ladder
            restarted at 1e-4 and jumped x100 every iteration, accepting a
            delta up to 100x too large: measured as a ~1%-per-iteration
            damped-step crawl on the B=512 ACOPF at full step sizes.
            Returns (factors, final_delta_w, final_delta_c, new_dw_last,
            n_refact)."""
            fct0 = fact_fn(jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
            dc = jnp.asarray(delta_c_bar, dtype) * mu**kappa_c
            dw_last = jnp.asarray(dw_last, dtype)
            start = jnp.where(
                dw_last == 0,
                jnp.asarray(delta0, dtype),
                jnp.maximum(jnp.asarray(delta_w_min, dtype), dw_last * kappa_minus),
            )
            grow = jnp.where(
                dw_last == 0,
                jnp.asarray(kappa_plus_bar, dtype),
                jnp.asarray(kappa_plus, dtype),
            )

            def reg_cond(carry):
                k, _dw, fct = carry
                return (~fct.ok) & (k < MAX_REG)

            def reg_body(carry):
                k, dw, _fct = carry
                dw_new = jnp.where(k == 0, start, dw * grow)
                return (k + 1, dw_new, fact_fn(dw_new, dc))

            k_fin, dw_fin, fct = jax.lax.while_loop(
                reg_cond, reg_body, (jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dtype), fct0)
            )
            dc_fin = jnp.where(k_fin > 0, dc, jnp.asarray(0.0, dtype))
            # update_fact_ok: remember the accepted positive delta
            dw_next = jnp.where(fct.ok & (dw_fin > 0), dw_fin, dw_last)
            return fct, dw_fin, dc_fin, dw_next, k_fin

        # linear_solver_dense=ldl_nopiv selects the inertia-revealing
        # on-device factorization INSIDE the fused program: blocked no-pivot
        # LDL^T with pivot-sign inertia folded into the ladder's `ok`, so
        # delta_w stays 0 whenever the true reduced Hessian is PD — the
        # fused-mode answer to the structurally-indefinite creep above.
        # MDS only: its partially reduced saddle leads with the dense PD-ish
        # K_d block, which no-pivot LDL^T handles; the raw XDYcYd ordering
        # leads with an indefinite (often zero-diagonal) Hessian block and
        # breaks the pivot-free factorization down (measured on the
        # densified ACOPF twin) — dense formulations keep the Cholesky
        # ladder + host fallback.
        use_ldl = bool(consts.get("fused_ldl", False)) and is_mds
        # mixed precision (kkt_fact_dtype=float32): factorize the saddle in
        # equilibrated f32 on the MXU, certify each solve with on-device f64
        # iterative refinement, and only on certification failure refactorize
        # in f64 (lax.cond — the expensive branch executes only when taken).
        # The on-device realization of the adaptive schedule
        # (mp_schedule=adaptive) of the host loop's _mp_fact_dtype.
        fused_mp = bool(consts.get("fused_mp", False)) and use_ldl
        ir_tol = consts.get("fused_ir_tol", 1e-9)
        mp_f32 = jnp.asarray(False)
        dw_next = jnp.asarray(dw_last, it.x.dtype)
        delta_w_used = jnp.asarray(0.0, it.x.dtype)
        # per-iteration phase counters (history columns 12-14): ladder
        # refactorizations, IR/FGMRES iterations on the primary solve, SOC
        # rounds — the fused-program equivalent of hiopRunKKTSolStats
        # (hiopRunStats.hpp:65); combined with fresh-process unit costs
        # (bench_subs.py mds_mp_parts) they give the per-phase time
        # decomposition of the iteration (docs/kernels.md).
        n_refact = jnp.asarray(0, jnp.int32)
        ir_primary = jnp.asarray(0, jnp.int32)
        # primary_fn, when set by a branch, produces the search direction
        # for the CURRENT residual by REUSING the certification probe's
        # solution (no second solve of the same rhs)
        primary_fn = None

        Dx, Dd = res_mod.barrier_diagonals(it, b)
        if is_qn:
            from hiop_tpu.kkt import lowrank as kkt_lowrank

            kdata = kkt_lowrank.LowRankKKTData(bfgs, Dx, Dd, Jc, Jd)

            def solve_compressed(rx_t, rd_t, ryc, ryd):
                return kkt_lowrank.solve_compressed(kdata, rx_t, rd_t, ryc, ryd)

            fct_ok = jnp.asarray(True)
        elif is_mds:
            from hiop_tpu.kkt import mds as kkt_mds

            if parametric:
                hss, Hdd = nlp.eval_hess_blocks(it.x, 1.0, it.yc, it.yd, th)
            else:
                hss, Hdd = nlp.eval_hess_blocks(it.x, 1.0, it.yc, it.yd)
            use_op = js_struct is not None
            if use_op:
                js_rows_, js_cols_, js_pairs_ = js_struct
                _jv_parts = []
                if nlp.m_eq:
                    _jv_parts.append(Jc[nlp.jac_sp_eq_rows, nlp.jac_sp_eq_cols])
                if nlp.m_ineq:
                    _jv_parts.append(Jd[nlp.jac_sp_in_rows, nlp.jac_sp_in_cols])
                js_vals_now = (
                    jnp.concatenate(_jv_parts) if _jv_parts
                    else jnp.zeros((0,), it.x.dtype)
                )

            def _mp_factorize(dw, dc, count_inertia=True):
                """Dispatch between the operator-form (triplet IR, no f64
                dense saddle) and the dense mp factorization."""
                if use_op:
                    return kkt_mds.factorize_saddle_device_mp_op(
                        hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                        Jc[:, ns:], Jd[:, ns:], js_vals_now, js_pairs_,
                        dw, dw, dc, dc, count_inertia=count_inertia,
                    )
                return kkt_mds.factorize_saddle_device_mp(
                    hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                    Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:],
                    dw, dw, dc, dc, count_inertia=count_inertia,
                )

            def _mp_solve(fct, rx_t, rd_t, ryc, ryd):
                """Returns (dxs, dxd, dd, dyc, dyd, certified, n_ir)."""
                if use_op:
                    return kkt_mds.solve_saddle_device_mp_op(
                        fct, js_rows_, js_cols_,
                        rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd, ir_tol,
                    )
                out = kkt_mds.solve_saddle_device_mp(
                    fct, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd, ir_tol
                )
                return (*out, jnp.asarray(0, jnp.int32))

            if use_ldl and fused_mp and consts.get("fused_inertia_free"):
                # inertia-free curvature acceptance
                # (hiopFactAcceptorInertiaFreeDWD + compute_search_direction
                # _inertia_free, hiopAlgFilterIPM.cpp:3374) fully on device:
                # factorize WITHOUT the pivot-count test, solve the primary
                # rhs, and accept when the regularized curvature along the
                # computed direction is positive — on degenerate problems
                # this accepts far smaller deltas than exact inertia
                # counting (the reference's recommendation for such
                # systems), and f32 pivot-sign flips cannot reject a good
                # factorization.
                neg_curv_fact = consts.get("neg_curv_fact", 1e-11)
                rx0, rd0, ryc0, ryd0 = res_mod.compress_rhs_xdycyd(resid, it, b)
                dt = it.x.dtype
                dc = jnp.asarray(delta_c_bar, dt) * mu**kappa_c
                dw_l = jnp.asarray(dw_last, dt)
                start = jnp.where(
                    dw_l == 0,
                    jnp.asarray(delta0, dt),
                    jnp.maximum(jnp.asarray(delta_w_min, dt), dw_l * kappa_minus),
                )
                grow = jnp.where(
                    dw_l == 0,
                    jnp.asarray(kappa_plus_bar, dt),
                    jnp.asarray(kappa_plus, dt),
                )

                def fact_solve_test(dw):
                    fct = _mp_factorize(dw, dc, count_inertia=False)
                    sol = _mp_solve(fct, rx0, rd0, ryc0, ryd0)
                    dxs, dxd, dd_, _dyc, _dyd, cert, n_ir = sol
                    curv = (
                        jnp.sum((hss + Dx[:ns] + dw) * dxs * dxs)
                        + dxd @ (Hdd @ dxd) + jnp.sum((Dx[ns:] + dw) * dxd * dxd)
                        + jnp.sum((Dd + dw) * dd_ * dd_)
                    )
                    nrm2 = dxs @ dxs + dxd @ dxd + dd_ @ dd_
                    good = fct.ok & cert & (curv >= neg_curv_fact * nrm2)
                    return fct, sol[:5], good, n_ir

                fct0_, sol0_, good0_, ir0_ = fact_solve_test(jnp.asarray(0.0, dt))

                def if_cond(carry):
                    k, _dw, _f, _s, good, _ir = carry
                    return (~good) & (k < MAX_REG)

                def if_body(carry):
                    k, dw, _f, _s, _g, _ir = carry
                    dw_new = jnp.where(k == 0, start, dw * grow)
                    f_, s_, g_, ir_ = fact_solve_test(dw_new)
                    return (k + 1, dw_new, f_, s_, g_, ir_)

                n_refact, dw_fin, fct32, sol_fin, good_fin, ir_primary = (
                    jax.lax.while_loop(
                        if_cond, if_body,
                        (jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dt),
                         fct0_, sol0_, good0_, ir0_),
                    )
                )
                dc_fin = dc
                delta_w_used = dw_fin
                dw_next = jnp.where(good_fin & (dw_fin > 0), dw_fin, dw_l)
                cert = good_fin
                need64 = jnp.asarray(False)
                mp_f32 = good_fin
                # downstream shared code reads fct32.ok as the acceptance
                fct32 = fct32._replace(ok=good_fin)
                fct_ok = good_fin

                def solve_compressed(rx_t, rd_t, ryc, ryd):
                    dxs, dxd, dd_, dyc, dyd = _mp_solve(
                        fct32, rx_t, rd_t, ryc, ryd
                    )[:5]
                    return jnp.concatenate([dxs, dxd]), dd_, dyc, dyd

                def primary_fn():
                    # the accepted ladder trial's solution IS the direction
                    # for the primary rhs — no second solve
                    dxs, dxd, dd_, dyc, dyd = sol_fin
                    return res_mod.recover_direction(
                        resid, it, b, jnp.concatenate([dxs, dxd]), dd_, dyc, dyd
                    )
            elif use_ldl and fused_mp:
                # f32 pivot signs are NOISY near zero pivots: at
                # late-barrier conditioning the equilibrated f32 LDL can
                # miscount the inertia at small delta_w (measured at B=512:
                # f32 says 4612 vs true 4608 at dw=0.125 while dw>=0.01 is
                # truly acceptable), and the spurious rejections pin the
                # ladder at O(1) regularization — a ~0.2%-per-iteration
                # objective crawl at full step sizes. When the f32 count
                # disagrees with the target, VERIFY it with a lazy f64
                # factorization (lax.cond — only contested trials pay the
                # ~350 ms): the f64 pivot signs are authoritative, the f32
                # factors still serve the (IR-certified) solves. Gated on
                # the same static memory plan as the f64 cert fallback.
                target_neg = m
                if mds_f64_fallback:
                    def _mp_fact_verified(dw, dc):
                        fct = _mp_factorize(dw, dc, count_inertia=False)
                        count_ok = fct.n_neg == target_neg

                        def verify(_):
                            f64 = kkt_mds.factorize_saddle_device(
                                hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                                Jc[:, :ns], Jc[:, ns:],
                                Jd[:, :ns], Jd[:, ns:],
                                dw, dw, dc, dc,
                            )
                            return f64.ok  # folds the true inertia test

                        count_ok = jax.lax.cond(
                            fct.ok & ~count_ok, verify,
                            lambda _: count_ok, 0,
                        )
                        return fct._replace(ok=fct.ok & count_ok)
                else:
                    _mp_fact_verified = _mp_factorize
                fct32, dw_fin, dc_fin, dw_next, n_refact = fact_with_reg(
                    _mp_fact_verified, it.x.dtype, dw_last,
                )
                delta_w_used = dw_fin
                # certification probe on the iteration's primary rhs: if the
                # f32 factors + f64 IR (+ the on-device FGMRES escalation)
                # cannot deliver the direction to ir_tol, refactorize in f64
                # at the ladder's final deltas — where the f64 fallback fits
                # in HBM (mds_f64_fallback, static); else exit to the host
                # loop (certification failures are rare with the FGMRES
                # stage, so the oversize problems keep the fused speed)
                rx0, rd0, ryc0, ryd0 = res_mod.compress_rhs_xdycyd(resid, it, b)
                probe = _mp_solve(fct32, rx0, rd0, ryc0, ryd0)
                cert = probe[5]
                ir_primary = probe[6]
                need64 = fct32.ok & ~cert
                mp_f32 = fct32.ok & cert

                if mds_f64_fallback:
                    def _fact64(_):
                        return kkt_mds.factorize_saddle_device(
                            hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                            Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:],
                            dw_fin, dw_fin, dc_fin, dc_fin,
                        )

                    def _fact64_dummy(_):
                        f64dt = it.x.dtype
                        Js64 = jnp.concatenate(
                            [Jc[:, :ns], Jd[:, :ns]], axis=0
                        ).astype(f64dt)
                        Jdn64 = jnp.concatenate(
                            [Jc[:, ns:], Jd[:, ns:]], axis=0
                        ).astype(f64dt)
                        return kkt_mds.MdsSaddleDeviceFactors(
                            jnp.zeros(
                                (fct32.L.shape[0], fct32.L.shape[0]), f64dt
                            ),
                            jnp.zeros((fct32.L.shape[0],), f64dt),
                            jnp.ones((nlp.n_dense + m,), f64dt),
                            fct32.ks_inv, Js64, Jdn64, fct32.dd_tot,
                            jnp.asarray(False),
                        )

                    fct64 = jax.lax.cond(need64, _fact64, _fact64_dummy, 0)
                    fct_ok = jnp.where(need64, fct64.ok, fct32.ok)
                else:
                    fct64 = None
                    fct_ok = fct32.ok & cert
                    need64 = jnp.asarray(False)

                def solve_compressed(rx_t, rd_t, ryc, ryd):
                    def s32(_):
                        return _mp_solve(fct32, rx_t, rd_t, ryc, ryd)[:5]

                    if fct64 is None:
                        dxs, dxd, dd, dyc, dyd = s32(0)
                    else:
                        def s64(_):
                            return kkt_mds.solve_saddle_device(
                                fct64, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd
                            )

                        dxs, dxd, dd, dyc, dyd = jax.lax.cond(
                            need64, s64, s32, 0
                        )
                    return jnp.concatenate([dxs, dxd]), dd, dyc, dyd

                def primary_fn():
                    # reuse the certification probe's certified-f32 solution
                    # for the primary direction; only a (rare) f64 demotion
                    # actually re-solves
                    dxs, dxd, dd_, dyc, dyd = probe[:5]
                    base = res_mod.recover_direction(
                        resid, it, b,
                        jnp.concatenate([dxs, dxd]), dd_, dyc, dyd,
                    )
                    if fct64 is None:
                        return base

                    def redo(_):
                        rx_t, rd_t, ryc, ryd = (rx0, rd0, ryc0, ryd0)
                        dxs64, dxd64, dd64, dyc64, dyd64 = (
                            kkt_mds.solve_saddle_device(
                                fct64, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd
                            )
                        )
                        return res_mod.recover_direction(
                            resid, it, b,
                            jnp.concatenate([dxs64, dxd64]), dd64, dyc64, dyd64,
                        )

                    return jax.lax.cond(need64, redo, lambda _: base, 0)
            elif use_ldl:
                fct, dw_fin, _dc, dw_next, n_refact = fact_with_reg(
                    lambda dw, dc: kkt_mds.factorize_saddle_device(
                        hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                        Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:],
                        dw, dw, dc, dc,
                    ),
                    it.x.dtype, dw_last,
                )
                delta_w_used = dw_fin

                def solve_compressed(rx_t, rd_t, ryc, ryd):
                    dxs, dxd, dd, dyc, dyd = kkt_mds.solve_saddle_device(
                        fct, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd
                    )
                    return jnp.concatenate([dxs, dxd]), dd, dyc, dyd
            else:
                fct, dw_fin, _dc, dw_next, n_refact = fact_with_reg(
                    lambda dw, dc: kkt_mds.factorize(
                        hss, Hdd, Dx[:ns], Dx[ns:], Dd,
                        Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:],
                        dw, dw, dc, dc,
                    ),
                    it.x.dtype, dw_last,
                )
                delta_w_used = dw_fin

                def solve_compressed(rx_t, rd_t, ryc, ryd):
                    dxs, dxd, dd, dyc, dyd = kkt_mds.solve(
                        fct, rx_t[:ns], rx_t[ns:], rd_t, ryc, ryd
                    )
                    return jnp.concatenate([dxs, dxd]), dd, dyc, dyd

            if not fused_mp:
                fct_ok = fct.ok
        else:
            from hiop_tpu.kkt import newton_dense as kkt_nd

            H = hess(it.x, it.yc, it.yd, th)
            fct, dw_fin, _dc, dw_next, n_refact = fact_with_reg(
                lambda dw, dc: kkt_nd.factorize_quick(
                    H, Dx, Dd, Jc, Jd, dw, dw, dc, dc
                ),
                it.x.dtype, dw_last,
            )
            delta_w_used = dw_fin

            def solve_compressed(rx_t, rd_t, ryc, ryd):
                return kkt_nd.solve_quick(fct, rx_t, rd_t, ryc, ryd)

            fct_ok = fct.ok

        def solve_dir(res):
            """Direction from the LIVE factorization for residual `res`
            (re-used by the second-order correction — triangular solves
            only, no refactorization)."""
            rx_t, rd_t, ryc, ryd = res_mod.compress_rhs_xdycyd(res, it, b)
            dx, dd, dyc, dyd = solve_compressed(rx_t, rd_t, ryc, ryd)
            return res_mod.recover_direction(res, it, b, dx, dd, dyc, dyd)

        dir_ = primary_fn() if primary_fn is not None else solve_dir(resid)

        ap_max, ad = it_mod.fraction_to_the_boundary(it, dir_, tau, b)
        theta_curr = theta_of(it, c, d_eval)
        phi_curr = logbar_phi(it, f, mu)
        gx = it_mod.add_logbar_grad_x(grad, it, b, mu)
        gx = it_mod.add_damping_grad_x(gx, b, mu, kappa_d)
        gd = it_mod.add_logbar_grad_d(jnp.zeros_like(it.d), it, b, mu)
        gd = it_mod.add_damping_grad_d(gd, b, mu, kappa_d)
        grad_phi_dx = gx @ dir_.x + gd @ dir_.d

        # ---------------- backtracking filter line search ------------------
        def ls_accept(theta_t, phi_t, alpha):
            far = theta_curr >= theta_min
            suff = (theta_t <= (1 - gamma_theta) * theta_curr) | (
                phi_t <= phi_curr - gamma_phi * theta_curr
            )
            in_filter = filter_contains(filt, filt_len, theta_t, phi_t)
            sw = (grad_phi_dx < 0) & (
                alpha * (-grad_phi_dx) ** s_phi > delta * theta_curr**s_theta
            )
            armijo = phi_t <= phi_curr + eta_phi * alpha * grad_phi_dx
            code_far = jnp.where(suff & ~in_filter, 1, 0)
            code_near = jnp.where(
                sw,
                jnp.where(armijo & ~in_filter, 3, 0),
                jnp.where(suff & ~in_filter, 2, 0),
            )
            return jnp.where(far, code_far, code_near)

        def trial_at(alpha):
            it_t = it_mod.take_step_primals(it, dir_, alpha)
            it_t, _ = it_mod.compute_safe_slacks(it_t, it, b, mu)
            f_t, c_t, d_t = evals(it_t.x, th)
            return it_t, f_t, c_t, d_t

        # first trial at the full fraction-to-the-boundary step
        it_t1, f_t1, c_t1, d_t1 = trial_at(ap_max)
        theta_t1 = theta_of(it_t1, c_t1, d_t1)
        phi_t1 = logbar_phi(it_t1, f_t1, mu)
        code1 = jnp.where(
            jnp.isfinite(f_t1), ls_accept(theta_t1, phi_t1, ap_max), 0
        )

        # ---- second-order correction (apply_second_order_correction,
        # hiopAlgFilterIPM.cpp:2949): when the FIRST trial fails without
        # improving infeasibility, correct the constraint residual with the
        # trial's violation and re-solve on the SAME factorization
        # (triangular solves only), up to max_soc_iter times while theta
        # contracts by kappa_soc. Acceptance uses the ORIGINAL alpha and
        # directional derivative, as in the reference.
        max_soc = int(consts.get("max_soc_iter", 4))
        kappa_soc = consts.get("kappa_soc", 0.99)
        dtt = it.x.dtype

        soc_init = (
            jnp.asarray(0), jnp.zeros_like(code1),
            crhs - c, it.d - d_eval, ap_max,
            jnp.asarray(jnp.inf, dtt), theta_t1,
            it_t1, f_t1, c_t1, d_t1, phi_t1, dir_, ad,
        )

        def soc_cond(carry):
            k, code, _cs, _ds, _a, th_prev, th_tr, *_ = carry
            return (code == 0) & (k < max_soc) & (
                (k == 0) | (th_tr <= kappa_soc * th_prev)
            )

        def soc_body(carry):
            (k, _code, c_soc, d_soc, alpha_soc, _th_prev, th_tr,
             _it_t, _f_t, c_t, d_t, _ph_t, _dsoc, _ad_s) = carry
            c_soc = alpha_soc * c_soc + (crhs - c_t)
            d_soc = alpha_soc * d_soc + (it.d - d_t)
            res_soc = resid._replace(ryc=c_soc, ryd=d_soc)
            dsoc = solve_dir(res_soc)
            ap_s, ad_s = it_mod.fraction_to_the_boundary(it, dsoc, tau, b)
            it_s = it_mod.take_step_primals(it, dsoc, ap_s)
            it_s, _ = it_mod.compute_safe_slacks(it_s, it, b, mu)
            f_s, c_s, d_s = evals(it_s.x, th)
            th_s = theta_of(it_s, c_s, d_s)
            ph_s = logbar_phi(it_s, f_s, mu)
            code_s = jnp.where(
                jnp.isfinite(f_s), ls_accept(th_s, ph_s, ap_max), 0
            )
            return (k + 1, code_s, c_soc, d_soc, ap_s, th_tr, th_s,
                    it_s, f_s, c_s, d_s, ph_s, dsoc, ad_s)

        do_soc = (code1 == 0) & (theta_curr <= theta_t1) & (max_soc > 0)
        soc_out = jax.lax.cond(
            do_soc,
            lambda ini: jax.lax.while_loop(soc_cond, soc_body, ini),
            lambda ini: ini,
            soc_init,
        )
        (_k_soc, soc_code, _cs, _ds, alpha_soc, _thp, theta_soc,
         it_soc, f_soc, c_soc_t, d_soc_t, phi_soc, dir_soc, ad_soc) = soc_out
        soc_ok = soc_code > 0

        # ---- backtracking from alpha/2 when neither the first trial nor
        # the SOC was accepted; a pre-accepted code makes this loop a no-op
        def ls_cond(carry):
            alpha, count, code, *_ = carry
            return (code == 0) & (alpha >= min_step) & (count < MAX_LS)

        def ls_body(carry):
            alpha, count, _code, it_t0, f_t0, c_t0, d_t0, th0, ph0 = carry
            it_t, f_t, c_t, d_t = trial_at(alpha)
            th_ = theta_of(it_t, c_t, d_t)
            ph = logbar_phi(it_t, f_t, mu)
            code = ls_accept(th_, ph, alpha)
            bad = ~jnp.isfinite(f_t)
            code = jnp.where(bad, 0, code)
            next_alpha = jnp.where(code == 0, alpha * 0.5, alpha)
            return (next_alpha, count + 1, code, it_t, f_t, c_t, d_t, th_, ph)

        pre_code = jnp.where(code1 > 0, code1, jnp.where(soc_ok, soc_code, 0))
        init = (
            ap_max * 0.5, jnp.asarray(1), pre_code,
            it_t1, f_t1, c_t1, d_t1, theta_t1, phi_t1,
        )
        alpha_bt, ls_count, bt_code, it_bt, f_bt, c_bt, d_bt, theta_bt, phi_bt = (
            jax.lax.while_loop(ls_cond, ls_body, init)
        )

        # select the accepted trial: first trial > SOC > backtracking
        use_soc = soc_ok & (code1 == 0)
        use_bt = (code1 == 0) & ~soc_ok

        def pick3(a1, a_soc, a_b):
            return jax.tree.map(
                lambda x1, xs, xb: jnp.where(
                    code1 > 0, x1, jnp.where(use_soc, xs, xb)
                ),
                a1, a_soc, a_b,
            )

        it_t = pick3(it_t1, it_soc, it_bt)
        f_t = pick3(f_t1, f_soc, f_bt)
        c_t = pick3(c_t1, c_soc_t, c_bt)
        d_t = pick3(d_t1, d_soc_t, d_bt)
        theta_t = pick3(theta_t1, theta_soc, theta_bt)
        phi_t = pick3(phi_t1, phi_soc, phi_bt)
        alpha_p = pick3(ap_max, alpha_soc, alpha_bt)
        ls_code = pick3(code1, soc_code, bt_code)
        dir_ = pick3(dir_, dir_soc, dir_)
        ad = pick3(ad, ad_soc, ad)
        ls_count = jnp.where(use_bt, ls_count, 1)
        accepted = ls_code > 0

        # filter augmentation decision (host applies it)
        sw_acc = (grad_phi_dx < 0) & (
            alpha_p * (-grad_phi_dx) ** s_phi > delta * theta_curr**s_theta
        )
        armijo_acc = phi_t <= phi_curr + eta_phi * alpha_p * grad_phi_dx
        add1 = (ls_code == 1) & ~(sw_acc & armijo_acc)
        filter_add = accepted & (add1 | (ls_code == 2))

        # ---------------- dual update + safeguards -------------------------
        it_new = it_mod.take_step_duals(it_t, dir_, alpha_p, ad)
        it_new = it_mod.adjust_duals(it_new, b, mu, kappa_sigma)
        if is_qn and m:
            # LSQ recompute of yc/yd from the pre-step derivatives when the
            # infeasibility is small (hiopDualsLsqUpdate::go ordering)
            from hiop_tpu.optimization import duals_update as du_mod

            yc_lsq, yd_lsq = du_mod.lsq_duals(
                Jc, Jd, grad, it_new.zl, it_new.zu, it_new.vl, it_new.vu
            )
            use_lsq = theta_t <= recalc_lsq_tol
            it_new = it_new._replace(
                yc=jnp.where(use_lsq, yc_lsq, it_new.yc),
                yd=jnp.where(use_lsq, yd_lsq, it_new.yd),
            )
        grad_n, Jc_n, Jd_n = derivs(it_new.x, th)

        # keep the old state when the step was not accepted (host falls back)
        def pick(new, old):
            return jax.tree.map(
                lambda a, o: jnp.where(accepted, a, o), new, old
            )

        if is_qn:
            state_new = FusedQNState(
                it=pick(it_new, it),
                f=jnp.where(accepted, f_t, f),
                c=pick(c_t, c),
                d=pick(d_t, d_eval),
                grad=pick(grad_n, grad),
                Jc=pick(Jc_n, Jc),
                Jd=pick(Jd_n, Jd),
                bfgs=bfgs,
                x_prev=pick(it.x, x_prev),
                grad_prev=pick(grad, grad_prev),
                Jc_prev=pick(Jc, Jc_prev),
                Jd_prev=pick(Jd, Jd_prev),
                have_prev=have_prev | accepted,
            )
        else:
            state_new = FusedState(
                it=pick(it_new, it),
                f=jnp.where(accepted, f_t, f),
                c=pick(c_t, c),
                d=pick(d_t, d_eval),
                grad=pick(grad_n, grad),
                Jc=pick(Jc_n, Jc),
                Jd=pick(Jd_n, Jd),
            )
        scal = FusedScalars(
            f=f, err_nlp=err_nlp, err_log=err_log,
            nlp_optim=norms.nlp_optim, nlp_feasib=norms.nlp_feasib,
            theta=theta_curr, phi=phi_curr,
            alpha_primal=alpha_p, alpha_dual=ad,
            ls_count=ls_count, ls_status=jnp.where(accepted, ls_code, 0),
            use_soc=use_soc & accepted,
            fact_ok=fct_ok, filter_add=filter_add,
            theta_add=theta_t, phi_add=phi_t,
            mp_f32=mp_f32,
            delta_w=delta_w_used,
            n_refact=n_refact,
            ir_primary=ir_primary,
            soc_rounds=_k_soc,
        )
        if parametric:
            return (th, state_new), scal, dw_next
        return state_new, scal, dw_next

    return jax.jit(step)
