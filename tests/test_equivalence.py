"""Cross-configuration equivalence tests.

The reference diffs per-iteration output tables between CPU and GPU builds
(tests/testMDS1CompareIterations.awk, SURVEY.md §4.3) to prove that a port
did not change the numerics. Here the axes are: KKT class, factorization
path, regularization variant, exec backend — all must agree on the
converged objective (and, for identical linear algebra, the trajectory)."""

import io

import numpy as np
import pytest

import examples.mds_ex1 as mx1
import examples.pridec_ex2 as px2
import examples.pridec_ex3 as px3
import examples.sparse_ex1 as sx1
from hiop_tpu import Logger


def _rel(a, b):
    return abs((a - b) / (1 + abs(b)))


def test_kkt_classes_agree_on_objective():
    objs = {}
    for kkt in ("xdycyd", "normaleqn", "condensed"):
        r = sx1.solve(50, verbosity_level=0, KKTLinsys=kkt)
        assert r.status.is_success, kkt
        objs[kkt] = r.obj
    assert _rel(objs["xdycyd"], objs["normaleqn"]) < 1e-8
    # condensed relaxes the equality by eq_relax_factor: looser agreement
    assert _rel(objs["xdycyd"], objs["condensed"]) < 1e-5


def test_fact_acceptors_agree_on_trajectory():
    r_ic = sx1.solve(50, verbosity_level=0, fact_acceptor="inertia_correction")
    r_if = sx1.solve(50, verbosity_level=0, fact_acceptor="inertia_free")
    assert r_ic.iterations == r_if.iterations
    assert _rel(r_ic.obj, r_if.obj) < 1e-10


def test_iteration_table_reproducible():
    """The per-iteration summary table (the awk-diff test interface) is
    identical across repeated runs of the same configuration."""
    import examples.dense_ex1 as ex1
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    tables = []
    for _ in range(2):
        buf = io.StringIO()
        o = NlpOptions()
        o.update(verbosity_level=3)
        nlp = NlpDenseConstraints(ex1.DenseConsEx1(100), o)
        nlp.log = Logger(3, stream=buf)
        FilterIPMQuasiNewton(nlp).run()
        tables.append(buf.getvalue())
    assert tables[0] == tables[1]


def test_pridec_matches_extensive_form():
    """The decomposition and the monolithic extensive form must agree
    (PriDec Ex2 vs Ex3) — small sizes for test speed."""
    r_full = px3.solve(8, 3, 2)
    solver = px2.solve(8, 3, 2, verbosity_level=0)
    r_dec = solver.run()
    assert r_full.status.is_success and r_dec.status.is_success
    assert abs(r_full.obj - r_dec.obj) < 1e-4


def test_repeated_solves_reuse_compilation():
    """hpc_multisolves analogue: repeated solves of same-shape problems
    must not recompile (wall time of the 3rd solve << 1st)."""
    import time

    r1 = mx1.solve(16, 8, verbosity_level=0)
    t0 = time.perf_counter()
    r2 = mx1.solve(16, 8, verbosity_level=0)
    dt2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r3 = mx1.solve(16, 8, verbosity_level=0)
    dt3 = time.perf_counter() - t0
    assert r3.status.is_success
    assert r2.obj == r3.obj
    assert dt3 < 30.0  # warm solves are fast (cold compile is minutes-scale)


def test_fused_iteration_matches_general_path():
    """jit_mode=iteration (one XLA computation per IPM iteration) must reach
    the same optimum as the general loop."""
    r_fused = sx1.solve(50, verbosity_level=0, jit_mode="iteration")
    r_std = sx1.solve(50, verbosity_level=0)
    assert r_fused.status.is_success
    assert _rel(r_fused.obj, r_std.obj) < 1e-8


def test_fused_iteration_fallback_on_hard_problem():
    """A problem needing regularization mid-solve must transparently fall
    back to the general loop and still succeed."""
    import examples.sparse_ex2 as sx2

    r = sx2.solve(50, verbosity_level=0, jit_mode="iteration")
    assert r.status.is_success
    ref, tol = sx2.SELFCHECK[50]
    assert _rel(r.obj, ref) <= tol


def test_fused_mds_matches_general_path():
    r_fused = mx1.solve(48, 16, driver_options=False, verbosity_level=0, jit_mode="iteration")
    r_std = mx1.solve(48, 16, driver_options=False, verbosity_level=0)
    assert r_fused.status.is_success
    assert _rel(r_fused.obj, r_std.obj) < 1e-7


def test_golden_iteration_table():
    """Numerics regression guard: the dense Ex1 n=100 iteration table must
    match the stored golden file byte-for-byte (regenerate deliberately with
    tests/data/golden_dense_ex1_n100.txt when the algorithm changes)."""
    import os

    import examples.dense_ex1 as ex1
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    buf = io.StringIO()
    o = NlpOptions()
    o.update(verbosity_level=3)
    nlp = NlpDenseConstraints(ex1.DenseConsEx1(100), o)
    nlp.log = Logger(3, stream=buf)
    FilterIPMQuasiNewton(nlp).run()
    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "golden_dense_ex1_n100.txt"
    )
    with open(golden_path) as f:
        golden = f.read()
    assert buf.getvalue() == golden


def test_fused_qn_matches_general_path():
    import examples.dense_ex1 as dx1
    from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions

    o1 = NlpOptions(); o1.update(verbosity_level=0, jit_mode="iteration")
    r_fused = FilterIPMQuasiNewton(NlpDenseConstraints(dx1.DenseConsEx1(200), o1)).run()
    o2 = NlpOptions(); o2.update(verbosity_level=0)
    r_std = FilterIPMQuasiNewton(NlpDenseConstraints(dx1.DenseConsEx1(200), o2)).run()
    assert r_fused.status.is_success
    assert _rel(r_fused.obj, r_std.obj) < 1e-9
