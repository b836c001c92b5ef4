"""KKT-class variants (condensed/normaleqn), Krylov solvers, outer IR, FR."""

import numpy as np
import jax.numpy as jnp
import pytest

import examples.sparse_ex1 as sx1
from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMNewton,
    NlpDenseConstraints,
    NlpOptions,
    SolveStatus,
)
from hiop_tpu.linalg import krylov


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def test_condensed_kkt_sparse_ex1():
    r = sx1.solve(50, verbosity_level=0, KKTLinsys="condensed")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= 1e-5  # equality relaxation perturbs slightly


def test_normaleqn_kkt_sparse_ex1():
    r = sx1.solve(50, verbosity_level=0, KKTLinsys="normaleqn")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_pcg_solves_spd_system():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((20, 20))
    A = jnp.asarray(A @ A.T + 20 * np.eye(20))
    x_true = jnp.asarray(rng.standard_normal(20))
    b = A @ x_true
    x, info = krylov.pcg(lambda v: A @ v, b, tol=1e-12, maxit=100)
    assert info.converged
    assert np.allclose(np.asarray(x), np.asarray(x_true), atol=1e-8)


def test_bicgstab_solves_nonsym_system():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((15, 15)) + 15 * np.eye(15))
    x_true = jnp.asarray(rng.standard_normal(15))
    b = A @ x_true
    x, info = krylov.bicgstab(lambda v: A @ v, b, tol=1e-12, maxit=200)
    assert info.converged
    assert np.allclose(np.asarray(x), np.asarray(x_true), atol=1e-7)


def test_krylov_over_pytrees():
    # operator acting diagonally on a dict pytree
    scale = {"a": jnp.asarray([2.0, 4.0]), "b": jnp.asarray([[8.0]])}
    b = {"a": jnp.asarray([2.0, 8.0]), "b": jnp.asarray([[16.0]])}
    mv = lambda v: {k: scale[k] * v[k] for k in v}
    x, info = krylov.pcg(mv, b, tol=1e-14, maxit=10)
    assert info.converged
    assert np.allclose(np.asarray(x["a"]), [1.0, 2.0])
    assert np.allclose(np.asarray(x["b"]), [[2.0]])


def test_force_resto_recovers():
    r = sx1.solve(50, verbosity_level=0, force_resto="yes")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= 1e-5


def test_soft_fr_rescues_rejected_steps(monkeypatch):
    """Force line-search rejections mid-solve so the step collapses below
    min_step_size: the soft feasibility-restoration retry
    (solve_soft_feasibility_restoration, hiopAlgFilterIPM.cpp:3235) must be
    attempted before the nested FR solve, and the solver must still
    converge to the selfcheck objective."""
    from hiop_tpu.optimization.filter_ipm import FilterIPMBase

    orig_ls = FilterIPMBase._accept_line_search_conditions
    orig_soft = FilterIPMBase._solve_soft_fr
    seen = {}

    def flaky_ls(self, *a, **kw):
        if self.iter_num == 3 and not seen.get("soft_ran"):
            return 0  # reject every trial on iteration 3 until FR triggers
        return orig_ls(self, *a, **kw)

    def spy_soft(self, *a, **kw):
        seen["soft_ran"] = True
        out = orig_soft(self, *a, **kw)
        seen["soft_ok"] = out is not None
        return out

    monkeypatch.setattr(FilterIPMBase, "_accept_line_search_conditions", flaky_ls)
    monkeypatch.setattr(FilterIPMBase, "_solve_soft_fr", spy_soft)
    r = sx1.solve(50, verbosity_level=0)
    assert seen.get("soft_ran"), "soft FR was never attempted"
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= 1e-5


def test_outer_ir_can_be_disabled():
    r = sx1.solve(50, verbosity_level=0, ir_outer_maxit=0)
    assert r.status.is_success


def test_sparse_ex3_degenerate_lp():
    """49 identical constraint rows, zero Hessian: the dual-regularization
    + inertia-fallback ladder must still reach the LP optimum 10 - 1e-6."""
    import examples.sparse_ex3 as sx3

    r = sx3.solve(50, verbosity_level=0)
    assert r.status.is_success
    assert abs(r.obj - (10.0 - 1e-6)) < 1e-4


def test_sparse_ex3_infeasible_detected():
    import examples.sparse_ex3 as sx3

    r = sx3.solve(
        20, ineq_feas=False, ineq_infeas=True, verbosity_level=0, max_iter=100
    )
    assert r.status in (
        SolveStatus.Infeasible_Problem,
        SolveStatus.Steplength_Too_Small,
    )


def test_matrix_free_condensed_matches_dense():
    r_dense = sx1.solve(200, verbosity_level=0, KKTLinsys="condensed")
    r_mf = sx1.solve(
        200, verbosity_level=0, KKTLinsys="condensed", linear_solver_sparse="cg"
    )
    assert r_mf.status.is_success
    assert _rel(r_mf.obj, r_dense.obj) < 1e-6


def test_matrix_free_condensed_large_n():
    """O(nnz) path: n=20000 sparse NLP with no dense (m,n) or (n,n)
    materialization anywhere in the solve."""
    r = sx1.solve(
        20000, verbosity_level=0, KKTLinsys="condensed", linear_solver_sparse="cg"
    )
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[5000]  # objective approaches the same limit
    assert abs(r.obj - 1.10351e-01) < 1e-4


def test_full_kkt_sparse_ex1():
    """KKTLinsys=full: direct LU of the unreduced 12-block system
    (hiopKKTLinSysSparseFull parity) reproduces the xdycyd trajectory."""
    r = sx1.solve(50, verbosity_level=0, KKTLinsys="full")
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_full_kkt_rank_deficient():
    """Full-space LU detects the singular Jacobian rows via tiny pivots and
    the delta_c bump recovers — same optimum as the compressed path."""
    import examples.sparse_ex2 as sx2

    r = sx2.solve(50, verbosity_level=0, KKTLinsys="full")
    assert r.status.is_success
    ref, tol = sx2.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_full_kkt_concave_fast():
    """On the concave Ex4 the full-space solve needs no delta_w just to
    factorize the indefinite Hessian block, converging in ~17 iterations
    (vs ~254 via the compressed Cholesky ladder)."""
    import examples.sparse_ex4 as sx4

    r = sx4.solve(KKTLinsys="full", verbosity_level=0)
    assert r.status.is_success
    ref, tol = sx4.SELFCHECK[2]
    assert _rel(r.obj, ref) <= tol
    assert r.iterations < 60


def test_sparse_direct_splu_matches_auto():
    """linear_solver_sparse=splu: host sparse-direct XDYcYd (SuperLU in the
    MA57 role) reproduces the dense-path trajectory without ever
    densifying the Hessian or Jacobian."""
    r1 = sx1.solve(50, verbosity_level=0, linear_solver_sparse="splu")
    r0 = sx1.solve(50, verbosity_level=0)
    assert r1.status.is_success
    assert r1.iterations == r0.iterations
    assert _rel(r1.obj, r0.obj) <= 1e-9


def test_sparse_direct_splu_rank_deficient():
    import examples.sparse_ex2 as sx2

    r = sx2.solve(50, verbosity_level=0, linear_solver_sparse="splu")
    assert r.status.is_success
    ref, tol = sx2.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_sparse_direct_splu_moderate_n():
    r = sx1.solve(2000, verbosity_level=0, linear_solver_sparse="splu")
    assert r.status.is_success
    assert _rel(r.obj, 1.1035e-01) <= 1e-3


def test_solver_registry_unknown_name():
    from hiop_tpu.linalg import solver_registry

    with pytest.raises(KeyError, match="no sparse direct solver"):
        solver_registry.get_solver_factory("ma57")


def test_solver_registry_custom_bridge():
    """A user-registered backend (the Ginkgo/MA57 bridge mechanism) is
    selected by name through the linear_solver_sparse option."""
    from hiop_tpu.linalg import solver_registry

    calls = {"n": 0}

    def dense_lu_factory(A_csc):
        import numpy as np

        calls["n"] += 1
        lu = np.linalg.inv(A_csc.toarray())

        class S:
            def solve(self, rhs):
                return lu @ rhs

        return S()

    solver_registry.register_solver("test-dense-bridge", dense_lu_factory)
    try:
        r = sx1.solve(20, verbosity_level=0, linear_solver_sparse="test-dense-bridge")
        assert r.status.is_success
        assert calls["n"] > 0
    finally:
        solver_registry._REGISTRY.pop("test-dense-bridge", None)


def test_fgmres_solves_nonsym_system():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((25, 25)) + 25 * np.eye(25))
    x_true = jnp.asarray(rng.standard_normal(25))
    b = A @ x_true
    x, info = krylov.fgmres(lambda v: A @ v, b, tol=1e-12, restart=8, maxit=200)
    assert info.converged
    assert np.allclose(np.asarray(x), np.asarray(x_true), atol=1e-8)


def test_fgmres_f32_preconditioner_reaches_f64_accuracy():
    """The ReSolve pattern: an f32 factorization as flexible right
    preconditioner lets FGMRES in f64 recover full precision in a few
    iterations."""
    import scipy.linalg as sla

    rng = np.random.default_rng(4)
    A64 = rng.standard_normal((30, 30)) + 30 * np.eye(30)
    x_true = rng.standard_normal(30)
    b = A64 @ x_true
    lu32 = sla.lu_factor(A64.astype(np.float32))

    def M_inv(v):
        return jnp.asarray(
            sla.lu_solve(lu32, np.asarray(v, np.float32)).astype(np.float64)
        )

    Aj, bj = jnp.asarray(A64), jnp.asarray(b)
    x, info = krylov.fgmres(lambda v: Aj @ v, bj, M_inv=M_inv, tol=1e-13, maxit=20)
    assert info.converged and info.iters <= 6
    assert np.allclose(np.asarray(x), x_true, atol=1e-9)


def test_mixed_precision_inner_ir_refines_to_selfcheck(monkeypatch):
    """kkt_fact_dtype=float32 factorizes on the f32 path and the FGMRES
    inner IR (ir_inner_*) recovers f64 directions; the solve must hit the
    f64 selfcheck objective and actually exercise the inner IR."""
    from hiop_tpu import NlpOptions, NlpSparse
    from hiop_tpu.linalg import krylov as krylov_mod

    calls = {"n": 0}
    orig = krylov_mod.fgmres

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(krylov_mod, "fgmres", spy)
    o = NlpOptions()
    o.update(verbosity_level=0, kkt_fact_dtype="float32", ir_inner_maxit=50)
    nlp = NlpSparse(sx1.SparseEx1(50), o)
    r = FilterIPMNewton(nlp).run()
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol
    assert calls["n"] > 0, "inner FGMRES IR was never invoked"


@pytest.mark.parametrize("scheme", ["mgs", "cgs2", "mgs_two_synch", "mgs_pm"])
def test_fgmres_gs_schemes_equivalent(scheme):
    """All four ir_inner_gs_scheme orthogonalizations (ReSolve
    IterativeRefinement::GramSchmidt, IterativeRefinement.cpp:435-773)
    solve to the same tolerance; the low-synch variants must keep the
    Krylov basis orthonormal enough to converge on an ill-conditioned
    system."""
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    # condition number ~1e6 to stress the orthogonalization
    A = jnp.asarray(Q @ np.diag(np.logspace(0, 6, 40)) @ Q.T)
    x_true = jnp.asarray(rng.standard_normal(40))
    b = A @ x_true
    x, info = krylov.fgmres(
        lambda v: A @ v, b, tol=1e-12, restart=40, maxit=200, gs_scheme=scheme
    )
    assert info.converged
    assert np.allclose(np.asarray(x), np.asarray(x_true), atol=1e-5)


def test_fgmres_gs_scheme_basis_orthonormality():
    """Directly verify the low-synch schemes produce an orthonormal basis
    (V^T V ~ I) by spying on the final Krylov subspace via a full-restart
    run on a moderately conditioned system."""
    rng = np.random.default_rng(8)
    A = rng.standard_normal((30, 30)) + 30 * np.eye(30)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.standard_normal(30))
    for scheme in ("cgs2", "mgs_two_synch", "mgs_pm"):
        V = []
        Lmat = np.zeros((31, 31))
        r = b / float(jnp.linalg.norm(b))
        V.append(r)
        for _ in range(10):
            w = Aj @ V[-1]
            _, hnorm, v_next = krylov._gs_orthogonalize(V, w, scheme, Lmat)
            assert v_next is not None and hnorm > 0
            V.append(v_next)
        Vm = np.stack([np.asarray(v) for v in V], axis=1)
        G = Vm.T @ Vm
        # one-pass two-synch MGS loses O(kappa*eps) orthogonality; cgs2 and
        # the post-modern correction restore it to machine precision
        atol = 1e-6 if scheme == "mgs_two_synch" else 1e-12
        assert np.allclose(G, np.eye(G.shape[0]), atol=atol), scheme


def test_full_kkt_coo_assembly_matches_dense_operator(monkeypatch):
    """The static-pattern COO assembly of SparseFullKKT equals the dense
    operator materialization (full_space.assemble_full) at a LIVE iterate
    mid-solve — the matrix-equivalence check the sparse assembler's
    docstring promises (values, pattern, AND the inactive-bound unit
    diagonals)."""
    import scipy.sparse as sp
    import jax.numpy as jnp
    from hiop_tpu.kkt import full_space
    from hiop_tpu.kkt.full_space_sparse import SparseFullKKT

    checked = {}
    orig_fact = SparseFullKKT.factorize

    def checking_fact(self, hvals, je_vals, ji_vals, it, b, deltas):
        ok = orig_fact(self, hvals, je_vals, ji_vals, it, b, deltas)
        if "done" not in checked and self_nlp is not None:
            vals = self._values(
                np.asarray(hvals, float), np.asarray(je_vals, float),
                np.asarray(ji_vals, float), it, b, deltas,
            )
            A_coo = sp.coo_matrix(
                (vals, (self._rows, self._cols)),
                shape=(self.ntot, self.ntot),
            ).toarray()
            n = self.n
            hr, hc = np.asarray(self_nlp.hess_rows), np.asarray(self_nlp.hess_cols)
            H = np.zeros((n, n))
            np.add.at(H, (hr, hc), np.asarray(hvals, float))
            off = hr != hc
            np.add.at(H, (hc[off], hr[off]), np.asarray(hvals, float)[off])
            Jc = np.zeros((self.m_eq, n))
            np.add.at(Jc, (np.asarray(self_nlp.jac_eq_rows),
                           np.asarray(self_nlp.jac_eq_cols)),
                      np.asarray(je_vals, float))
            Jd = np.zeros((self.m_ineq, n))
            np.add.at(Jd, (np.asarray(self_nlp.jac_in_rows),
                           np.asarray(self_nlp.jac_in_cols)),
                      np.asarray(ji_vals, float))
            A_dense = np.asarray(full_space.assemble_full(
                jnp.asarray(H), jnp.asarray(Jc), jnp.asarray(Jd),
                it, b, *deltas,
            ))
            checked["max_abs_diff"] = float(np.abs(A_coo - A_dense).max())
            checked["done"] = True
        return ok

    from hiop_tpu import NlpSparse, NlpOptions, FilterIPMNewton

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", tolerance=1e-8,
             mu0=0.1, verbosity_level=0, KKTLinsys="full", max_iter=4)
    self_nlp = NlpSparse(sx1.SparseEx1(30), o)
    monkeypatch.setattr(SparseFullKKT, "factorize", checking_fact)
    FilterIPMNewton(self_nlp).run()
    assert checked.get("done"), "full-KKT factorize never ran"
    assert checked["max_abs_diff"] < 1e-12


@pytest.mark.slow
def test_full_kkt_scales_to_2e5():
    """Scale proof for the unreduced 12-block sparse path
    (hiopKKTLinSysSparse.cpp:845-849 parity): n=200,000 gives a compound
    KKT dimension N = 5n+5mi+me+mi ~ 2e6; a dense (N,N) would be ~32 TB,
    so completing the solve at all proves the O(nnz) COO assembly claim
    (full_space_sparse.py). Records factorize s/iter from the time_kkt
    stats and bounds host RSS."""
    import resource
    import time

    from hiop_tpu import FilterIPMNewton, NlpOptions, NlpSparse

    n = 200_000
    o = NlpOptions()
    o.update(
        Hessian="analytical_exact",
        verbosity_level=0,
        KKTLinsys="full",
        fact_acceptor="inertia_free",
        max_iter=3,
        time_kkt="on",
    )
    nlp = NlpSparse(sx1.SparseEx1(n), o)
    t0 = time.time()
    r = FilterIPMNewton(nlp).run()
    wall = time.time() - t0
    assert r.iterations >= 2 and np.isfinite(r.obj)
    fact_s = nlp.runstats.kkt.tm_update_fact.elapsed
    assert fact_s > 0.0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert rss_gb < 24.0, f"peak RSS {rss_gb:.1f} GB — dense materialization?"
    print(
        f"full KKT n={n}: {r.iterations} iters, factorize {fact_s:.2f}s total, "
        f"wall {wall:.1f}s, peak RSS {rss_gb:.2f} GB"
    )
