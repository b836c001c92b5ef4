"""MDS path tests: block KKT with Schur elimination of the sparse block."""

import numpy as np
import pytest

import examples.mds_ex1 as mx1


def test_mds_ex1_matches_reference_objective():
    """Under the reference driver's options, the converged objective must
    match HiOp's saved value -49.994906... within its 1e-6 selfcheck
    tolerance (NlpMdsEx1Driver.cpp:149)."""
    r = mx1.solve(400, 100, verbosity_level=0)
    assert r.status.is_success
    assert abs(r.obj - mx1.SELFCHECK_OBJ) < 1e-6


def test_mds_ex1_tight_convergence():
    r = mx1.solve(48, 16, driver_options=False, verbosity_level=0)
    assert r.status.is_success
    assert r.err_nlp <= 1e-8


def test_mds_ex1_small_sizes():
    r = mx1.solve(16, 4, verbosity_level=0)
    assert r.status.is_success


def test_mds_ex2_nonconvex_selfcheck():
    import examples.mds_ex2 as mx2

    r = mx2.solve(400, 100, verbosity_level=0)
    assert r.status.is_success
    assert abs((r.obj - mx2.SELFCHECK_OBJ) / mx2.SELFCHECK_OBJ) <= 1e-6


def test_mds_ex2_rank_deficient():
    import examples.mds_ex2 as mx2

    r = mx2.solve(
        48, 12, rankdefic_eq=True, rankdefic_ineq=True, verbosity_level=0
    )
    assert r.status.is_success


def test_mds_ex1_empty_sp_row():
    r = mx1.solve(16, 8, empty_sp_row=True, verbosity_level=0)
    assert r.status.is_success
