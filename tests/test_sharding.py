"""Distributed (sharded) solver tests on the 8-device virtual CPU mesh.

The reference's equivalence methodology (SURVEY.md §4.3): the same problem
solved single-device and sharded must produce the same iteration trajectory
(objective/iterations) to tight tolerance — MPI 2-rank runs vs serial in
the reference, mesh-sharded vs single-chip here."""

import numpy as np
import jax
import pytest

import examples.dense_ex1 as ex1
import examples.dense_ex2 as ex2
from hiop_tpu import FilterIPMQuasiNewton, NlpDenseConstraints, NlpOptions
from hiop_tpu.parallel.mesh import make_mesh, shard_formulation, shard_n


needs_multi = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _solve_sharded(problem, n_devices, **opts):
    o = NlpOptions()
    o.update(verbosity_level=0, **opts)
    nlp = NlpDenseConstraints(problem, o)
    mesh = make_mesh(n_devices)
    shard_formulation(nlp, mesh)
    return FilterIPMQuasiNewton(nlp).run()


def _solve_single(problem, **opts):
    o = NlpOptions()
    o.update(verbosity_level=0, **opts)
    nlp = NlpDenseConstraints(problem, o)
    return FilterIPMQuasiNewton(nlp).run()


@needs_multi
def test_dense_ex1_sharded_matches_single():
    r1 = _solve_single(ex1.DenseConsEx1(512))
    r8 = _solve_sharded(ex1.DenseConsEx1(512), 8)
    assert r8.status.is_success
    # same math, same trajectory up to reduction-order roundoff
    assert r8.iterations == r1.iterations
    assert abs(r8.obj - r1.obj) <= 1e-9 * (1 + abs(r1.obj))


@needs_multi
def test_dense_ex2_sharded_matches_single():
    r1 = _solve_single(ex2.DenseConsEx2(512))
    r8 = _solve_sharded(ex2.DenseConsEx2(512), 8)
    assert r8.status.is_success
    assert abs(r8.obj - r1.obj) <= 1e-7 * (1 + abs(r1.obj))


@needs_multi
def test_sharded_iterate_stays_sharded():
    """The x-sized leaves must remain sharded through a solve (no silent
    gather-to-host)."""
    o = NlpOptions()
    o.update(verbosity_level=0, max_iter=3)
    nlp = NlpDenseConstraints(ex1.DenseConsEx1(512), o)
    mesh = make_mesh(8)
    shard_formulation(nlp, mesh)
    x0 = nlp.get_starting_point()
    assert len(x0.sharding.device_set) == 8


@needs_multi
def test_psum_microbenchmark_runs():
    from hiop_tpu.parallel import collectives_bench

    mesh = make_mesh(8)
    res = collectives_bench.run(mesh, base_count=1024, num_sizes=2, reps=2)
    assert len(res) == 2
    assert all(dt > 0 for _, dt in res)


@needs_multi
def test_sharded_reduction_is_replicated_scalar():
    mesh = make_mesh(8)
    import jax.numpy as jnp

    x = shard_n(mesh, jnp.arange(512, dtype=jnp.float64))
    s = jnp.sum(x)
    assert float(s) == 512 * 511 / 2


@needs_multi
def test_pridec_scenarios_sharded_over_mesh():
    """Scenario-batch evaluation sharded across the mesh (the TPU analogue
    of the reference's PriDec MPI scenario distribution, SURVEY.md §2.10)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import examples.pridec_ex1 as px1

    mesh = make_mesh(8, axis_name="s")
    p = px1.PriDecEx1(16, 64)
    x0 = np.zeros(16)
    idxs = jax.device_put(
        jnp.arange(64), NamedSharding(mesh, P("s"))
    )
    rvals, grads = p.eval_rterms_batched(idxs, x0)
    # sharded batch axis in, correct totals out
    rv_ref = [p.eval_f_rterm(i, x0) for i in range(64)]
    assert np.allclose(np.asarray(rvals), rv_ref)
    assert grads.shape == (64, 16)


@needs_multi
def test_callback_mem_space_host():
    o = NlpOptions()
    o.update(verbosity_level=0, callback_mem_space="host", max_iter=3)
    prob = ex1.DenseConsEx1(128)
    seen = []

    def cb(info):
        seen.append(type(info.x))
        return True

    prob.iterate_callback = cb
    nlp = NlpDenseConstraints(prob, o)
    FilterIPMQuasiNewton(nlp).run()
    assert all(t is np.ndarray for t in seen)


@needs_multi
def test_fused_qn_sharded_mesh():
    """jit_mode=iteration + n-axis sharding: the entire distributed QN
    iteration (secant update with psum'd Gram matrices, replicated Schur
    solve, fraction-to-the-boundary pmin, line search) executes as ONE
    partitioned XLA program per iteration."""
    o = NlpOptions()
    o.update(verbosity_level=0, jit_mode="iteration")
    nlp = NlpDenseConstraints(ex1.DenseConsEx1(512), o)
    shard_formulation(nlp, make_mesh(8))
    r = FilterIPMQuasiNewton(nlp).run()
    assert r.status.is_success
    assert abs(r.obj - 8.6157e-02) < 1e-5


def test_sharded_schur_assembly_matches_single_device():
    """Mesh-sharded triplet Schur assembly (kkt.mds.schur_js_triplets_sharded):
    pair list partitioned over 8 devices, partial scatters psum'd over the
    mesh — bit-identical structure to the single-device product (the
    multi-chip Newton KKT assembly primitive)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(3)
    m, ns, nnz = 48, 160, 420
    rc = rng.choice(m * ns, nnz, replace=False)
    rows, cols = rc // ns, rc % ns
    vals = jnp.asarray(rng.standard_normal(nnz))
    ksinv = jnp.asarray(
        rng.uniform(0.5, 2.0, ns) * np.sign(rng.standard_normal(ns))
    )
    pairs = kkt_mds.build_schur_pairs(rows, cols, ns)
    ref = kkt_mds.schur_js_triplets(vals, ksinv, pairs, m)
    mesh = Mesh(np.array(jax.devices()), ("x",))
    out = kkt_mds.schur_js_triplets_sharded(vals, ksinv, pairs, m, mesh)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_mds_kkt_gspmd_sharded_matches_single_device():
    """The whole MDS KKT factorize+solve runs under GSPMD with the sparse
    variable axis sharded over the mesh (Js column-sharded, hss/Dxs/rxs
    sharded, dense block replicated): XLA inserts the collectives for the
    diag elimination, the Schur products, and the replicated Cholesky —
    directions match single-device to machine precision. This is the
    §2.9-style n-axis distribution applied to the NEWTON path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hiop_tpu.kkt import mds as kkt_mds

    rng = np.random.default_rng(4)
    ns, nd, mc = 512, 16, 96
    hss = jnp.asarray(rng.uniform(0.5, 2.0, ns))
    A = rng.standard_normal((nd, nd))
    Hdd = jnp.asarray(A @ A.T + nd * np.eye(nd))
    Dxs = jnp.asarray(rng.uniform(0.1, 1.0, ns))
    Dxd = jnp.asarray(rng.uniform(0.1, 1.0, nd))
    Dd = jnp.zeros((0,))
    Jc_s = jnp.asarray(rng.standard_normal((mc, ns)))
    Jc_d = jnp.asarray(rng.standard_normal((mc, nd)))
    rxs, rxd, ryc = (jnp.asarray(rng.standard_normal(k)) for k in (ns, nd, mc))

    def fs(hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, rxs, rxd, ryc):
        f = kkt_mds.factorize(
            hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, Jc_s[:0], Jc_d[:0],
            0.0, 0.0, 0.0, 0.0,
        )
        z = jnp.zeros((0,), f.Ld.dtype)
        return kkt_mds.solve(f, rxs, rxd, z, ryc, z)

    args = (hss, Hdd, Dxs, Dxd, Dd, Jc_s, Jc_d, rxs, rxd, ryc)
    ref = jax.jit(fs)(*args)
    mesh = Mesh(np.array(jax.devices()), ("x",))
    sh_n = NamedSharding(mesh, P("x"))
    rep = NamedSharding(mesh, P())
    sh_cols = NamedSharding(mesh, P(None, "x"))
    sharded = jax.jit(
        fs,
        in_shardings=(sh_n, rep, sh_n, rep, rep, sh_cols, rep, sh_n, rep, rep),
    )
    out = sharded(*args)
    for a, b in zip(ref, out):
        if a.size:
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_sharded_mds_newton_acopf_matches_single():
    """The ENTIRE MDS Newton solve runs with the formulation sharded over
    a mesh (shard_formulation on an NlpMDS): identical iteration count and
    objective to 8e-15 on the ACOPF driver problem — the reference's
    MPI-vs-serial iteration-equivalence check applied to the Newton/MDS
    path."""
    import examples.acopf_mds as am
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation

    def run(shard):
        o = NlpOptions()
        o.update(Hessian="analytical_exact", fixed_var="relax",
                 tolerance=1e-6, mu0=0.1, verbosity_level=0)
        nlp = NlpMDS(am.AcopfMds(16), o)
        if shard:
            shard_formulation(nlp, make_mesh(2))
        return FilterIPMNewton(nlp).run()

    r0, r1 = run(False), run(True)
    assert r0.status.is_success and r1.status.is_success
    assert r0.iterations == r1.iterations
    assert abs(r0.obj - r1.obj) < 1e-10


@needs_multi
def test_sharded_pad_and_mask_uneven_n():
    """n=509 over an 8-device mesh: shard_formulation auto-wraps the
    problem in PaddedDenseProblem (inert pad variables), and the solve
    reproduces the unpadded single-device trajectory exactly."""
    r1 = _solve_single(ex1.DenseConsEx1(509))
    r8 = _solve_sharded(ex1.DenseConsEx1(509), 8)
    assert r8.status.is_success
    assert r8.iterations == r1.iterations
    assert abs(r8.obj - r1.obj) <= 1e-9 * (1 + abs(r1.obj))
    assert r8.x.shape == (509,)  # result trimmed back to the user's n
    np.testing.assert_allclose(r8.x, r1.x, atol=1e-8)


@needs_multi
def test_sharded_newton_pad_uneven_n():
    """Newton (analytical_exact Hessian) on an auto-padded uneven-n
    problem: PaddedDenseProblem.eval_hess_lagr must embed the inner
    Hessian with an identity pad block, keeping the pad variables exactly
    inert (ADVICE r3: an inconsistent delegated Hessian broke this)."""
    import jax.numpy as jnp
    from hiop_tpu import AutoDiffNlpProblem, FilterIPMNewton

    n = 13

    def make():
        return AutoDiffNlpProblem(
            f=lambda x: jnp.sum((x - 0.7) ** 2) + 0.05 * jnp.sum(x**4),
            c=lambda x: jnp.stack([jnp.sum(x)]),
            xl=np.full(n, -3.0), xu=np.full(n, 3.0),
            cl=np.array([1.0]), cu=np.array([4.0]),
            x0=np.full(n, 0.2),
        )

    def run(shard):
        o = NlpOptions()
        o.update(verbosity_level=0, Hessian="analytical_exact")
        nlp = NlpDenseConstraints(make(), o)
        if shard:
            shard_formulation(nlp, make_mesh(4))
        return FilterIPMNewton(nlp).run()

    r1, r4 = run(False), run(True)
    assert r4.status.is_success
    assert r4.iterations == r1.iterations
    assert abs(r4.obj - r1.obj) <= 1e-9 * (1 + abs(r1.obj))
    assert r4.x.shape == (n,)
    np.testing.assert_allclose(r4.x, r1.x, atol=1e-8)


@needs_multi
def test_sharded_mds_newton_acopf_b512_matches_single():
    """Sharded-vs-single equivalence at the NORTH-STAR shape (B=512:
    5120 sparse + 102 dense vars, m=4608). Full convergence is minutes on
    the virtual-CPU mesh, so the check runs the first 3 Newton iterations
    and requires identical objectives to reduction-order roundoff — the
    iteration-table-diff technique (SURVEY.md §4.3) at real scale."""
    import examples.acopf_mds as am
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions
    from hiop_tpu.parallel.mesh import make_mesh, shard_formulation

    def run(shard):
        o = NlpOptions()
        o.update(Hessian="analytical_exact", fixed_var="relax",
                 tolerance=1e-6, mu0=0.1, verbosity_level=0, max_iter=3,
                 kkt_fact_dtype="float32")
        nlp = NlpMDS(am.AcopfMds(512), o)
        if shard:
            shard_formulation(nlp, make_mesh(2))
        return FilterIPMNewton(nlp).run()

    r0, r1 = run(False), run(True)
    assert r0.iterations == r1.iterations == 3
    assert abs(r0.obj - r1.obj) <= 1e-8 * (1 + abs(r0.obj))
