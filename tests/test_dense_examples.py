"""Integration tests: ported reference Dense driver examples with selfcheck
objectives (reference tier-2 test strategy, SURVEY.md §4.2)."""

import numpy as np
import pytest

import examples.dense_ex1 as ex1
import examples.dense_ex2 as ex2
import examples.dense_ex3 as ex3


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def test_dense_ex1_selfcheck_500():
    r = ex1.solve(500, verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex1.SELFCHECK[500]
    assert _rel(r.obj, ref) <= tol


def test_dense_ex1_distorted_mesh():
    r = ex1.solve(500, ratio=0.2, verbosity_level=0)
    assert r.status.is_success


def test_dense_ex2_selfcheck_500():
    r = ex2.solve(500, verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex2.SELFCHECK[500]
    assert _rel(r.obj, ref) <= tol


def test_dense_ex2_unconstrained():
    r = ex2.solve(500, unconstrained=True, verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex2.SELFCHECK_UNCON[500]
    assert _rel(r.obj, ref) <= 1e-5


def test_dense_ex3_fixed_vars_relax():
    r = ex3.solve(500, fixed_var="relax", verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex3.SELFCHECK[500]
    assert _rel(r.obj, ref) <= 1e-5


def test_dense_ex3_requires_fixed_var_option():
    with pytest.raises(ValueError):
        ex3.solve(500, fixed_var="none", verbosity_level=0)


def test_dense_ex4_selfcheck():
    import examples.dense_ex4 as ex4

    r = ex4.solve(verbosity_level=0)
    assert r.status.is_success
    assert _rel(r.obj, ex4.SELFCHECK_OBJ) <= 1e-6


def test_dense_ex4_unconstrained():
    import examples.dense_ex4 as ex4

    r = ex4.solve(unconstrained=True, verbosity_level=0)
    assert r.status.is_success
    assert abs(r.obj - (-605.0)) < 1e-4


def test_dense_ex1_selfcheck_5000():
    """Reference CI scale point (Dense/CMakeLists.txt registers n=5000)."""
    r = ex1.solve(5000, verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex1.SELFCHECK[5000]
    assert _rel(r.obj, ref) <= tol


def test_dense_ex2_selfcheck_5000():
    r = ex2.solve(5000, verbosity_level=0)
    assert r.status.is_success
    ref, tol = ex2.SELFCHECK[5000]
    assert _rel(r.obj, ref) <= tol


def test_two_call_constraint_convention():
    """The reference's two-call eval_cons (per-eq/ineq-subset evaluation,
    hiopInterface.hpp:303-366) must produce the same solve as the one-call
    convention: same objective and same iteration count."""
    import jax.numpy as jnp

    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    class TwoCallEx1(ex1.DenseConsEx1):
        one_call_used = False

        def eval_cons(self, x):
            # two-call users never get the one-call form invoked
            type(self).one_call_used = True
            return super().eval_cons(x)

        def eval_cons_subset(self, x, idx_cons):
            c_all = jnp.sum(self.mass * x)[None]
            return c_all[jnp.asarray(np.asarray(idx_cons, dtype=int))]

    o = NlpOptions()
    o.update(verbosity_level=0)
    r2 = FilterIPMQuasiNewton(NlpDenseConstraints(TwoCallEx1(300), o)).run()
    assert not TwoCallEx1.one_call_used
    o1 = NlpOptions()
    o1.update(verbosity_level=0)
    r1 = FilterIPMQuasiNewton(NlpDenseConstraints(ex1.DenseConsEx1(300), o1)).run()
    assert r2.status.is_success
    assert r2.iterations == r1.iterations
    assert _rel(r2.obj, r1.obj) <= 1e-12
