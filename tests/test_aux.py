"""Auxiliary subsystem tests: checkpoint/resume, write_kkt, deepchecks,
warm start, moving limits, elastic mode (SURVEY.md §5)."""

import glob
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

import examples.dense_ex1 as ex1
import examples.sparse_ex1 as sx1
from hiop_tpu import (
    AutoDiffNlpProblem,
    FilterIPMQuasiNewton,
    NlpDenseConstraints,
    NlpOptions,
)
from hiop_tpu.utils import checkpoint as ckpt


def test_checkpoint_roundtrip_file():
    state = {
        "n": 5, "m_eq": 1, "m_ineq": 2, "mu": 0.1, "iter_num": 7,
        "theta_max": 10.0, "theta_min": 1e-4,
        "filter_entries": [(1.0, 2.0), (0.5, 3.0)],
        "it_x": np.arange(5.0),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "chk.npz")
        ckpt.save_state(path, state)
        loaded = ckpt.load_state(path)
    assert loaded["iter_num"] == 7
    assert loaded["mu"] == 0.1
    assert np.allclose(loaded["it_x"], np.arange(5.0))
    assert loaded["filter_entries"] == [(1.0, 2.0), (0.5, 3.0)]
    ckpt.validate(loaded, 5, 1, 2)
    with pytest.raises(ValueError):
        ckpt.validate(loaded, 6, 1, 2)


def test_checkpoint_save_and_resume_solver():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.npz")
        # run a few iterations with periodic checkpointing
        r1 = ex1.solve(
            200, verbosity_level=0, max_iter=5,
            checkpoint_save="yes", checkpoint_save_every_N_iter=2,
            checkpoint_file=path,
        )
        assert os.path.exists(path)
        # resume and converge
        r2 = ex1.solve(
            200, verbosity_level=0,
            checkpoint_load_on_start="yes", checkpoint_file=path,
        )
        assert r2.status.is_success
        # resumed solve must take fewer iterations than from scratch
        r_full = ex1.solve(200, verbosity_level=0)
        assert r2.iterations <= r_full.iterations


def test_write_kkt_dumps_files():
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as d:
        os.chdir(d)
        try:
            r = sx1.solve(20, verbosity_level=0, write_kkt="yes", max_iter=3)
            files = glob.glob("hiop_tpu_kkt_iter*.npz")
            assert len(files) >= 1
            z = np.load(files[0])
            assert "Jc" in z.files and "dx" in z.files
        finally:
            os.chdir(cwd)


def test_deepchecks_mode_runs():
    r = sx1.solve(20, verbosity_level=0, deepchecks="yes")
    assert r.status.is_success


def test_warm_start():
    n = 6
    p = AutoDiffNlpProblem(
        f=lambda x: 0.5 * jnp.sum(x**2),
        c=lambda x: jnp.sum(x)[None],
        xl=-1e20 * np.ones(n), xu=1e20 * np.ones(n),
        cl=np.array([1.0]), cu=np.array([1.0]),
        x0=np.zeros(n),
    )
    x_star = np.full(n, 1.0 / n)

    def warmstart():
        return (
            x_star, np.zeros(n), np.zeros(n),
            np.array([-1.0 / n]), np.zeros(0), None, None, None,
        )

    p.get_warmstart_point = warmstart
    o = NlpOptions()
    o.update(verbosity_level=0, warm_start="yes")
    r = FilterIPMQuasiNewton(NlpDenseConstraints(p, o)).run()
    assert r.status.is_success
    # warm-started from the optimum: should converge very fast
    assert r.iterations <= 6


def test_moving_limits():
    r = ex1.solve(100, verbosity_level=0, moving_lim_abs=0.05)
    assert r.status.is_success


def test_elastic_mode():
    r = sx1.solve(20, verbosity_level=0, elastic_mode="correct_it")
    assert r.status.is_success


def test_iajaaa_roundtrip():
    from hiop_tpu.utils.kkt_io import read_iajaaa, write_iajaaa

    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6))
    A[np.abs(A) < 0.7] = 0.0
    rhs = rng.standard_normal(6)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "kkt.iajaaa")
        write_iajaaa(path, A, rhs=rhs)
        A2, vecs = read_iajaaa(path)
    assert np.allclose(A2, A)
    assert np.allclose(vecs[0], rhs)


def test_execspace_resolution():
    from hiop_tpu import NlpOptions
    from hiop_tpu.backends.execspace import ExecSpaceInfo

    o = NlpOptions()
    o.update(compute_mode="cpu")
    info = ExecSpaceInfo.from_options(o)
    assert info.device is not None and info.device.platform == "cpu"
    o.update(exec_policies="pallas")
    assert ExecSpaceInfo.from_options(o).kernel_backend == "pallas"


def test_profile_dir_writes_trace(tmp_path):
    """profile_dir wraps the solve in a jax profiler trace (SURVEY.md 5.1)."""
    import examples.dense_ex2 as ex2

    d = str(tmp_path / "Trace_Dir")  # mixed case must survive the option
    r = ex2.solve(50, verbosity_level=0, profile_dir=d)
    assert r.status.is_success
    import os
    assert os.path.isdir(d)
    found = any(f for _, _, fs in os.walk(d) for f in fs)
    assert found, "profiler trace directory is empty"


def test_checkpoint_orbax_roundtrip_and_resume():
    """checkpoint_format=orbax: the sidre-IOManager analogue (sharded
    tensorstore directory) round-trips and resumes the solver."""
    pytest.importorskip("orbax.checkpoint")
    state = {
        "n": 5, "m_eq": 1, "m_ineq": 2, "mu": 0.1, "iter_num": 7,
        "theta_max": 10.0, "theta_min": 1e-4,
        "filter_entries": [(1.0, 2.0), (0.5, 3.0)],
        "it_x": np.arange(5.0),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "chk_orbax")
        ckpt.save_state(path, state, fmt="orbax")
        assert os.path.isdir(path)
        loaded = ckpt.load_state(path)
        assert loaded["iter_num"] == 7
        assert np.allclose(loaded["it_x"], np.arange(5.0))
        assert loaded["filter_entries"] == [(1.0, 2.0), (0.5, 3.0)]
        ckpt.validate(loaded, 5, 1, 2)

        # solver roundtrip through the orbax directory format
        path2 = os.path.join(d, "state_orbax")
        ex1.solve(
            200, verbosity_level=0, max_iter=5,
            checkpoint_save="yes", checkpoint_save_every_N_iter=2,
            checkpoint_file=path2, checkpoint_format="orbax",
        )
        assert os.path.isdir(path2)
        r2 = ex1.solve(
            200, verbosity_level=0,
            checkpoint_load_on_start="yes", checkpoint_file=path2,
        )
        assert r2.status.is_success
