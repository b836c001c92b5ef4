"""Adaptive mixed-precision schedule tests (VERDICT r2 #8).

kkt_fact_dtype=float32 pairs an f32 factorization with f64 refinement (the
ReSolve pattern).  mp_schedule=adaptive replaces the fixed mu cutover with
an IR-residual-driven policy: stay f32 while the f64 residual certifies
each solve, demote when it stops, re-enter f32 when the safe-mode ladder
de-escalates after clean iterations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
from examples.acopf_mds import AcopfMds, SELFCHECK


def _solve_acopf(**opts):
    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, kkt_fact_dtype="float32", verbosity_level=0, **opts,
    )
    nlp = NlpMDS(AcopfMds(32), o)
    return FilterIPMNewton(nlp).run(), nlp


def test_adaptive_converges_and_reports_f32_fraction():
    r, nlp = _solve_acopf(mp_schedule="adaptive")
    ref, tol = SELFCHECK[32]
    assert r.status.is_success
    assert abs(r.obj - ref) <= tol * max(1.0, abs(ref))
    k = nlp.runstats.kkt
    assert k.n_fact_total > 0
    assert 0 < k.n_fact_f32 <= k.n_fact_total
    assert "in f32" in nlp.runstats.get_summary()


def test_adaptive_extends_f32_strictly_below_mu_threshold(monkeypatch):
    """VERDICT r3 #10: the residual-driven policy must PROVABLY extend f32
    past the fixed mu >= 1e-4 cutover on the ACOPF driver — f32
    factorizations must occur at mu < mp_mu_threshold, and the adaptive
    run's f32 count must be STRICTLY larger than the fixed-cutover run's."""
    import hiop_tpu.optimization.filter_ipm as fi

    below = {"n": 0}
    orig = fi._mp_count_fact

    def spy(strategy):
        if (
            strategy.fact_dtype == jnp.float32
            and strategy._mu < strategy._mp_mu_threshold
        ):
            below["n"] += 1
        orig(strategy)

    monkeypatch.setattr(fi, "_mp_count_fact", spy)
    r_a, nlp_a = _solve_acopf(mp_schedule="adaptive")
    assert r_a.status.is_success
    assert below["n"] > 0, (
        "adaptive never factorized f32 below the mu cutover — the feature's "
        "whole justification"
    )
    _, nlp_t = _solve_acopf(mp_schedule="mu_threshold")
    assert nlp_a.runstats.kkt.n_fact_f32 > nlp_t.runstats.kkt.n_fact_f32


def test_mds_residual_demotes_on_bad_f32_solve(monkeypatch):
    """Corrupt the f32 compressed solve: the f64 residual check must catch
    it, demote to f64, recompute the direction, and still converge."""
    import hiop_tpu.optimization.filter_ipm as fi

    orig = fi._MdsStrategy._solve
    state = {"corrupted": 0}

    def bad_solve(self, f, rx_t, rd_t, ryc, ryd):
        out = orig(self, f, rx_t, rd_t, ryc, ryd)
        if self.fact_dtype == jnp.float32 and state["corrupted"] < 500:
            # a useless f32 'factorization': zero preconditioner, so the
            # inner FGMRES-IR cannot make progress and must demote
            state["corrupted"] += 1
            return tuple(jnp.zeros_like(a) for a in out)
        return out

    monkeypatch.setattr(fi._MdsStrategy, "_solve", bad_solve)
    demotions = []
    orig_demote = fi._mp_demote

    def spy_demote(strategy, why):
        demotions.append(why)
        orig_demote(strategy, why)

    monkeypatch.setattr(fi, "_mp_demote", spy_demote)
    r, _ = _solve_acopf(mp_schedule="adaptive")
    assert state["corrupted"] > 0
    assert demotions, "corrupted f32 solve was not caught by the residual check"
    assert r.status.is_success


def test_saddle_mp_factors_solve_and_inertia():
    """Unit: the equilibrated-f32 saddle factorization must deliver an
    IR-certified f64 solve and the exact inertia of the f64 saddle."""
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(3)
    ns, nd, mc, md = 12, 5, 4, 6
    hss = jnp.asarray(rng.uniform(0.5, 3.0, ns))
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + nd * np.eye(nd))
    Dxs = jnp.zeros(ns)
    Dxd = jnp.zeros(nd)
    Dd = jnp.asarray(rng.uniform(0.5, 2.0, md))
    Jc = jnp.asarray(rng.standard_normal((mc, ns + nd)))
    Jd = jnp.asarray(rng.standard_normal((md, ns + nd)))
    z = jnp.asarray(0.0)
    f = kkt_mds.factorize_saddle_device_mp(
        hss, Hdd, Dxs, Dxd, Dd, Jc[:, :ns], Jc[:, ns:],
        Jd[:, :ns], Jd[:, ns:], z, z, z, z,
    )
    assert bool(f.ok)
    # inertia check against the f64 eigen-decomposition of the saddle
    w = np.linalg.eigvalsh(np.asarray(f.M))
    n_neg_M = int(np.sum(w < 0))
    assert n_neg_M == mc + md  # ok folded the inertia test already

    rxs = jnp.asarray(rng.standard_normal(ns))
    rxd = jnp.asarray(rng.standard_normal(nd))
    rd = jnp.asarray(rng.standard_normal(md))
    ryc = jnp.asarray(rng.standard_normal(mc))
    ryd = jnp.asarray(rng.standard_normal(md))
    dxs, dxd, dd, dyc, dyd, cert = kkt_mds.solve_saddle_device_mp(
        f, rxs, rxd, rd, ryc, ryd
    )
    assert bool(cert)
    # residual of the reduced saddle system
    dd_inv = 1.0 / np.asarray(f.dd_tot)
    rhs = np.concatenate([
        np.asarray(rxd),
        np.concatenate([ryc, ryd + dd_inv * rd])
        - np.asarray(f.Js) @ (np.asarray(f.ks_inv) * np.asarray(rxs)),
    ])
    sol = np.concatenate([dxd, np.concatenate([dyc, dyd])])
    res = rhs - np.asarray(f.M) @ sol
    assert np.linalg.norm(res) <= 1e-8 * (1 + np.linalg.norm(rhs))


def test_saddle_mp_survives_barrier_illconditioning():
    """The equilibration must keep f32+IR certified on a saddle with the
    late-barrier diagonal blowup (Dx entries ~ 1e10 next to O(1) rows)."""
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(7)
    ns, nd, mc, md = 20, 4, 3, 5
    hss = jnp.asarray(rng.uniform(0.5, 2.0, ns))
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + nd * np.eye(nd))
    # half the sparse vars at active bounds: huge barrier diagonals
    Dxs = jnp.asarray(np.where(np.arange(ns) % 2 == 0, 1e10, 1e-4))
    Dxd = jnp.asarray(np.full(nd, 1e8))
    Dd = jnp.asarray(rng.uniform(1e-6, 1e6, md))
    Jc = jnp.asarray(rng.standard_normal((mc, ns + nd)))
    Jd = jnp.asarray(rng.standard_normal((md, ns + nd)))
    z = jnp.asarray(0.0)
    f = kkt_mds.factorize_saddle_device_mp(
        hss, Hdd, Dxs, Dxd, Dd, Jc[:, :ns], Jc[:, ns:],
        Jd[:, :ns], Jd[:, ns:], z, z, z, z,
    )
    assert bool(f.ok)
    rhs_parts = [rng.standard_normal(k) for k in (ns, nd, md, mc, md)]
    out = kkt_mds.solve_saddle_device_mp(
        f, *(jnp.asarray(p) for p in rhs_parts)
    )
    assert bool(out[5]), "IR failed to certify on the equilibrated system"


def test_fused_solve_mixed_precision_matches_f64():
    """jit_mode=solve with kkt_fact_dtype=float32: the whole solve runs as
    one XLA program with the equilibrated-f32 LDL^T + on-device f64 IR, and
    must converge to the same objective as the f64 fused solve, actually
    using f32 factorizations (runstats accounting from the history buffer)."""
    common = dict(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0, jit_mode="solve",
        linear_solver_dense="ldl_nopiv",
    )
    o32 = NlpOptions()
    o32.update(kkt_fact_dtype="float32", mp_schedule="adaptive", **common)
    nlp32 = NlpMDS(AcopfMds(32), o32)
    r32 = FilterIPMNewton(nlp32).run()

    o64 = NlpOptions()
    o64.update(kkt_fact_dtype="float64", **common)
    nlp64 = NlpMDS(AcopfMds(32), o64)
    r64 = FilterIPMNewton(nlp64).run()

    ref, tol = SELFCHECK[32]
    assert r32.status.is_success
    assert abs(r32.obj - ref) <= tol * max(1.0, abs(ref))
    assert abs(r32.obj - r64.obj) <= 1e-5 * max(1.0, abs(r64.obj))
    k = nlp32.runstats.kkt
    assert k.n_fact_total > 0 and k.n_fact_f32 > 0
    # the equilibrated f32 tier should carry (nearly) every iteration on
    # this well-scaled driver problem
    assert k.n_fact_f32 >= 0.8 * k.n_fact_total


def test_deescalation_reenters_f32():
    """Unit-level: N clean safe-mode iterations step the ladder back and
    re-enable f32 (switch_to_fast_KKT analogue)."""
    import hiop_tpu.optimization.filter_ipm as fi
    from hiop_tpu.utils.logger import Logger

    class P:
        delta_wx = 0.0

    class S:
        perturb = P()
        log = Logger(verbosity=0)
        _safe_mode = 1
        _safe_tiers = ("lu_eig",)
        _chronic_delta = 0
        _mp_schedule = "adaptive"
        _mp_f32_ok = False
        _deesc_n = 3
        _deesc_clean = 0
        _deesc_budget = 2

    s = S()
    for _ in range(3):
        assert s._safe_mode == 1
        fi._maybe_deescalate_safe(s)
    assert s._safe_mode == 0
    assert s._mp_f32_ok is True
    assert s._deesc_budget == 1
    # regularized iterations reset the clean streak
    s2 = S()
    s2._safe_mode = 1
    fi._maybe_deescalate_safe(s2)
    fi._maybe_deescalate_safe(s2)
    s2.perturb = type("P2", (), {"delta_wx": 1e-8})()
    fi._maybe_deescalate_safe(s2)
    assert s2._deesc_clean == 0
    assert s2._safe_mode == 1


def test_saddle_mp_uncertified_when_factors_are_useless():
    """The IR certification must report failure when the f32 factors carry
    no information (the IR cannot reduce the backward error) — the fused
    program's lax.cond then refactorizes in f64 (fused_newton need64
    branch) instead of using the bad direction.  (Note: ill-conditioned
    but genuinely factorized systems certify in the BACKWARD-error sense,
    which is the criterion — this test corrupts the factors outright.)"""
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(3)
    ns, nd, mc, md = 12, 5, 4, 6
    hss = jnp.asarray(rng.uniform(0.5, 3.0, ns))
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + nd * np.eye(nd))
    Jc = jnp.asarray(rng.standard_normal((mc, ns + nd)))
    Jd = jnp.asarray(rng.standard_normal((md, ns + nd)))
    z = jnp.asarray(0.0)
    f = kkt_mds.factorize_saddle_device_mp(
        hss, Hdd, jnp.zeros(ns), jnp.zeros(nd),
        jnp.asarray(rng.uniform(0.5, 2.0, md)),
        Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:], z, z, z, z,
    )
    # useless 'factorization': identity L, unit pivots — the approximate
    # solve is just the (scaled) rhs, so IR stagnates at O(1) backward error
    f_bad = f._replace(L=jnp.zeros_like(f.L), d=jnp.ones_like(f.d))
    rhs = [jnp.asarray(rng.standard_normal(k)) for k in (ns, nd, md, mc, md)]
    out = kkt_mds.solve_saddle_device_mp(f_bad, *rhs)
    assert not bool(out[5]), "IR certified a solve from information-free factors"
    good = kkt_mds.solve_saddle_device_mp(f, *rhs)
    assert bool(good[5])


def test_fused_inertia_free_acceptance_converges():
    """fact_acceptor=inertia_free inside the fused mp program
    (hiopFactAcceptorInertiaFreeDWD on device): the curvature-test ladder
    must converge to the same objective as the inertia-exact acceptance.
    Non-default: on this driver the exact-inertia acceptor converges in
    fewer iterations; the curvature acceptor exists for degenerate
    problems where pivot counting over-regularizes."""
    r_if, nlp_if = _solve_acopf(
        mp_schedule="adaptive", jit_mode="solve",
        linear_solver_dense="ldl_nopiv", fact_acceptor="inertia_free",
    )
    ref, tol = SELFCHECK[32]
    assert r_if.status.is_success
    assert abs(r_if.obj - ref) <= tol * max(1.0, abs(ref))
    k = nlp_if.runstats.kkt
    assert k.n_fact_total > 0 and k.n_fact_f32 > 0
