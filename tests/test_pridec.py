"""PriDec solver tests."""

import numpy as np
import pytest

import examples.pridec_ex1 as px1
from hiop_tpu import PriDecOptions


def test_pridec_ex1_converges_to_analytic():
    solver = px1.solve(10, 30, verbosity_level=0)
    r = solver.run()
    assert r.status.is_success
    assert abs(r.obj - (0.5 * 30 * 10 + 0.5 * 10)) < 1e-5


def test_pridec_ex1_serial_fallback_matches_batched():
    p = px1.PriDecEx1(6, 12)
    x0 = np.linspace(0.0, 1.0, 6)
    rv_b, gr_b = p.eval_rterms_batched(np.arange(12), x0)
    rv_s = [p.eval_f_rterm(i, x0) for i in range(12)]
    gr_s = np.stack([p.eval_grad_rterm(i, x0) for i in range(12)])
    assert np.allclose(np.asarray(rv_b), rv_s, atol=1e-12)
    assert np.allclose(np.asarray(gr_b), gr_s, atol=1e-12)


def test_pridec_options():
    o = PriDecOptions()
    assert o.num("alpha_min") == 1e-5
    o.set("alpha_max", 1e4)
    assert o.num("alpha_max") == 1e4


def test_pridec_ex2_nlp_recourse():
    """Scenario evaluations that are themselves IPM solves (small size for
    test speed; the full reference selfcheck nx=20 S=5 passes via
    examples/pridec_ex2.py -selfcheck)."""
    import examples.pridec_ex2 as px2

    solver = px2.solve(8, 3, 2, verbosity_level=0, max_iter=15)
    r = solver.run()
    assert r.status.is_success
    assert np.isfinite(r.obj)
