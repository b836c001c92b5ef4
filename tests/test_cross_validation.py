"""Cross-validation against an independent solver (IpoptAdapter parity):
our converged objectives must match scipy.optimize on the same problems."""

import numpy as np
import pytest

pytest.importorskip("scipy")

import examples.dense_ex4 as ex4
import examples.sparse_ex1 as sx1
from hiop_tpu.utils.scipy_adapter import solve_with_scipy


def test_sparse_ex1_matches_scipy():
    p = sx1.SparseEx1(30)
    ours = sx1.solve(30, verbosity_level=0)
    theirs = solve_with_scipy(p)
    assert ours.status.is_success
    assert abs(ours.obj - theirs.fun) < 1e-6 * (1 + abs(theirs.fun))


def test_dense_ex4_matches_scipy():
    p = ex4.DenseConsEx4()
    ours = ex4.solve(verbosity_level=0)
    theirs = solve_with_scipy(p, x0=np.array([9.0, 5.0]))  # basin of the optimum
    assert ours.status.is_success
    assert abs(ours.obj - theirs.fun) < 1e-5 * (1 + abs(theirs.fun))


def test_checkpoint_from_iterate_callback():
    """save_checkpoint callable mid-solve from the user callback (reference
    DenseConsEx1 sidre usage)."""
    import os
    import tempfile

    import examples.dense_ex1 as ex1
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    prob = ex1.DenseConsEx1(100)
    o = NlpOptions()
    o.update(verbosity_level=0)
    nlp = NlpDenseConstraints(prob, o)
    solver = FilterIPMQuasiNewton(nlp)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cb.npz")

        def cb(info):
            if info.iter == 3:
                solver.save_checkpoint(path)
            return True

        prob.iterate_callback = cb
        r = solver.run()
        assert r.status.is_success
        assert os.path.exists(path)


def test_randomized_regularization_runs():
    import examples.sparse_ex2 as sx2

    r = sx2.solve(50, verbosity_level=0, regularization_method="randomized")
    assert r.status.is_success


def test_mds_acopf_cross_validates_with_exact_hessian():
    """IpoptAdapter-class round trip on the MDS interface: the ACOPF MDS
    problem flattens through the adapter (blocks -> dense jac/hess), the
    exact Lagrangian Hessian feeds trust-constr, and the independent
    solution must agree in objective AND satisfy KKT stationarity under
    OUR derivatives with THEIR multipliers."""
    from examples.acopf_mds import AcopfMds, SELFCHECK
    from hiop_tpu.utils.scipy_adapter import cross_validate

    B = 16
    import examples.acopf_mds as am
    r = am.solve(B, verbosity_level=0)
    assert r.status.is_success
    rep = cross_validate(
        AcopfMds(B), r.obj, ours_x=r.x, method="trust-constr", tol=1e-4
    )
    assert rep.agrees, rep
    assert rep.their_kkt_stationarity < 1e-4 * (1 + abs(rep.theirs_obj)), rep
    if B in SELFCHECK:
        ref, tol = SELFCHECK[B]
        assert abs(rep.theirs_obj - ref) <= max(tol, 1e-4) * max(1.0, abs(ref))


def test_sparse_hessian_forwarded_to_trust_constr():
    """The triplet Hessian surface must reach trust-constr (exact second
    order, the reference's eval_h forwarding) and reproduce the SLSQP
    objective."""
    import examples.sparse_ex1 as sx1
    from hiop_tpu.utils.scipy_adapter import _dense_hess_fn, solve_with_scipy

    p = sx1.SparseEx1(30)
    n, m = p.get_prob_sizes()
    h = _dense_hess_fn(p, n, m)
    assert h is not None
    H = h(np.asarray(p.get_starting_point()), 1.0, np.zeros(m))
    assert H.shape == (n, n) and np.allclose(H, H.T)
    r_tc = solve_with_scipy(p, method="trust-constr", maxiter=3000)
    r_sl = solve_with_scipy(p)
    assert abs(r_tc.fun - r_sl.fun) < 1e-5 * (1 + abs(r_sl.fun))
