"""Options registry tests (reference hiopOptions semantics)."""

import os
import tempfile

import pytest

from hiop_tpu import NlpOptions, PriDecOptions


def test_defaults():
    o = NlpOptions()
    assert o.num("mu0") == 1.0
    assert o.num("tolerance") == 1e-8
    assert o.integer("max_iter") == 3000
    assert o.str_("duals_update_type") == "lsq"
    assert o.str_("Hessian") == "quasinewton_approx"
    assert o.integer("secant_memory_len") == 6


def test_range_validation_keeps_old_value():
    o = NlpOptions()
    assert not o.set("tolerance", 10.0)  # above ub
    assert o.num("tolerance") == 1e-8
    assert not o.set("KKTLinsys", "bogus")
    assert o.str_("KKTLinsys") == "auto"


def test_unknown_option_ignored():
    o = NlpOptions()
    assert not o.set("not_an_option", 1)


def test_user_defined_tracking():
    o = NlpOptions()
    assert not o.is_user_defined("mu0")
    o.set("mu0", 0.5)
    assert o.is_user_defined("mu0")
    assert o.num("mu0") == 0.5


def test_load_from_file():
    with tempfile.NamedTemporaryFile("w", suffix=".options", delete=False) as f:
        f.write("# comment line\n")
        f.write("mu0 0.25\n")
        f.write("max_iter 77\n")
        f.write("duals_update_type linear  # trailing comment\n")
        path = f.name
    try:
        o = NlpOptions(options_file=path)
        assert o.num("mu0") == 0.25
        assert o.integer("max_iter") == 77
        assert o.str_("duals_update_type") == "linear"
    finally:
        os.unlink(path)


def test_consistency_quasinewton_kkt():
    o = NlpOptions()
    o.set("KKTLinsys", "condensed")  # invalid with quasinewton Hessian
    assert o.str_("KKTLinsys") == "auto"


def test_pridec_defaults():
    o = PriDecOptions()
    assert o.num("alpha_max") == 1e6
    assert o.integer("max_iter") == 30000


def test_pretty_print_contains_user_values():
    o = NlpOptions()
    o.set("mu0", 0.5)
    s = o.pretty_print(only_user_defined=True)
    assert "mu0" in s and "0.5" in s
