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
