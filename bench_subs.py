"""Individual benchmark measurements, each run in a FRESH subprocess by
bench.py (the remote-relay dispatch floor degrades in-process timings after
other large executables have run — docs/kernels.md 'Measurement note').

Each sub-benchmark prints ONE JSON line on stdout.  Invoke directly for
debugging:  python bench_subs.py acopf512
"""

from __future__ import annotations

import json
import sys
import time


def _jax():
    import jax

    return jax


# ---------------------------------------------------------------------------
def _acopf_flops(B: int, nd: int):
    """Counted FLOPs of one quick-tier MDS KKT factorize+solve at the ACOPF
    shape (kkt/mds.py): dense-block Cholesky (nd+m' reduction is dominated
    by) the m x m Schur Cholesky + the triplet-Schur assembly + the
    (m, nd) @ (nd, m) border products.  m = 9B, ns = 10B."""
    m = 9 * B
    ns = 10 * B
    nnz_js = 2 * (B + 2 * len(_ring_chords(B))) + 18 * B  # ~ Jacobian nnz
    chol_schur = m ** 3 / 3.0
    border = 2.0 * m * nd * m + nd ** 3 / 3.0  # Jd^T Kdd^-1 Jd + dense chol
    tri_solves = 2.0 * m * m  # two triangular solves per rhs
    return chol_schur + border + tri_solves, dict(m=m, ns=ns, nnz=nnz_js)


def _ring_chords(B):
    out = [(i, (i + 1) % B) for i in range(B)]
    if B >= 8:
        out += [(i, i + B // 2) for i in range(0, B // 2, 4)]
    return out


def acopf_solve(n_bus: int, platform: str | None = None, jit_mode: str = "solve",
                max_iter: int = 10000, repeats: int = 2):
    """End-to-end ACOPF MDS solve: iterations/s, KKT factorize ms/iter,
    objective.  Runs cold (includes compile through the persistent cache)
    then warm in the same process.  jit_mode=solve (the production config)
    runs the whole solve as ONE fused XLA program with the mixed-precision
    f32 factorization + on-device f64 IR; the per-phase time_kkt stats only
    exist on the jit_mode=kernels host loop, so in fused mode the KKT
    factorize cost is micro-timed directly (fact_probe)."""
    import os

    if platform:
        os.environ["HIOP_TPU_PLATFORM"] = platform
    from examples.acopf_mds import AcopfMds
    from hiop_tpu import FilterIPMNewton, NlpMDS, NlpOptions

    fused = jit_mode in ("solve", "iteration")
    runs = []
    obj = None
    # ONE formulation reused across repeats: the fused executable caches on
    # the formulation, so the warm repeats measure pure device execution
    # (the repeated-solves pattern, hpc_multisolves.cpp).  The cold run
    # includes Python tracing + (cache-miss) XLA compilation; a fresh
    # formulation would re-pay ~40 s of tracing per solve at B=512 even
    # with the XLA cache warm — that retrace was round 4's 'unattributed
    # 1.5 s/iter'.
    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0, kkt_fact_dtype="float32",
        mp_schedule="adaptive", linear_solver_dense="ldl_nopiv",
        jit_mode=jit_mode, time_kkt="off" if fused else "on",
        max_iter=max_iter,
    )
    nlp = NlpMDS(AcopfMds(n_bus), o)
    for k in range(repeats):
        k_st = nlp.runstats.kkt
        fact0, f320 = k_st.n_fact_total, k_st.n_fact_f32
        t0 = time.time()
        solver = FilterIPMNewton(nlp)
        r = solver.run()
        wall = time.time() - t0
        rec = dict(
            wall_s=round(wall, 2),
            iters=int(r.iterations),
            s_per_iter=round(wall / max(r.iterations, 1), 4),
            status=r.status.name,
        )
        d_fact = k_st.n_fact_total - fact0
        if d_fact:
            rec["f32_fact_frac"] = round(
                (k_st.n_fact_f32 - f320) / d_fact, 3
            )
        hist = getattr(solver, "_last_fused_hist", None)
        n_it = int(r.iterations)
        if fused and hist is not None and n_it > 0:
            h = hist[: min(n_it, hist.shape[0])]
            # per-iteration phase counters (fused history cols 12-14):
            # multiplied by the mds_mp_parts unit costs they decompose
            # the iteration time (docs/kernels.md)
            rec["mean_refact"] = round(float(h[:, 12].mean()), 2)
            rec["mean_ir"] = round(float(h[:, 13].mean()), 2)
            rec["mean_soc"] = round(float(h[:, 14].mean()), 2)
            rec["mean_ls_trials"] = round(float(h[:, 6].mean()), 2)
        if not fused and k_st.n_fact_total:
            rec.update(
                fact_s_total=round(k_st.fact_seconds_total(), 2),
                kkt_s_total=round(k_st.kkt_seconds_total(), 2),
                fact_ms_per_iter=round(
                    1e3 * k_st.fact_seconds_total() / max(r.iterations, 1), 2
                ),
            )
        runs.append(rec)
        obj = float(r.obj)
    best = min(runs, key=lambda d: d["wall_s"])
    flops, shape = _acopf_flops(n_bus, max(4, n_bus // 5))
    out = dict(
        bench=f"acopf{n_bus}",
        obj=obj,
        cold=runs[0],
        warm=best,
        iters_per_s=round(best["iters"] / best["wall_s"], 3),
        kkt_flops_per_iter=flops,
        shape=shape,
    )
    fact_s = best.get("fact_ms_per_iter", 0.0) / 1e3
    if fused:
        try:
            out["fact_probe_ms"] = fact_probe_ms(nlp)
            fact_s = out["fact_probe_ms"] / 1e3
        except Exception as e:  # probe is best-effort
            out["fact_probe_err"] = f"{type(e).__name__}: {e}"
    if fact_s:
        out["kkt_gflops"] = round(flops / fact_s / 1e9, 1)
    return out


def _probe_operands(nlp):
    """Representative fused-mode KKT operands at the starting point,
    including the triplet structure for the operator-form mp path."""
    import jax.numpy as jnp
    from hiop_tpu.kkt import mds as kkt_mds

    ns, nd = nlp.n_sparse, nlp.n_dense
    x0 = nlp.get_starting_point()
    Jc, Jd = nlp.eval_jac(x0)
    yc = jnp.zeros((nlp.m_eq,), x0.dtype)
    yd = jnp.zeros((nlp.m_ineq,), x0.dtype)
    hss, Hdd = nlp.eval_hess_blocks(x0, 1.0, yc, yd)
    Dxs = jnp.ones((ns,), x0.dtype)
    Dxd = jnp.ones((nd,), x0.dtype)
    Dd = jnp.ones((nlp.m_ineq,), x0.dtype)
    struct = kkt_mds.mds_js_struct(nlp)
    js_vals = None
    if struct is not None:
        parts = []
        if nlp.m_eq:
            parts.append(Jc[nlp.jac_sp_eq_rows, nlp.jac_sp_eq_cols])
        if nlp.m_ineq:
            parts.append(Jd[nlp.jac_sp_in_rows, nlp.jac_sp_in_cols])
        js_vals = jnp.concatenate(parts)
    return dict(
        ns=ns, nd=nd, Jc=Jc, Jd=Jd, hss=hss, Hdd=Hdd,
        Dxs=Dxs, Dxd=Dxd, Dd=Dd, struct=struct, js_vals=js_vals,
        z=jnp.asarray(0.0, x0.dtype),
    )


def fact_probe_ms(nlp, reps: int = 6):
    """Micro-time the fused-mode MDS KKT factorization at this problem's
    shape with representative operands (identity-ish blocks + the real
    Jacobian structure at the starting point), syncing through a scalar
    fetch so the relay cannot hide incomplete work.  Uses the production
    operator-form factorization (kkt/mds.py factorize_saddle_device_mp_op)
    when the triplet structure is available."""
    import jax
    from hiop_tpu.kkt import mds as kkt_mds

    p = _probe_operands(nlp)
    ns, z = p["ns"], p["z"]
    Jc, Jd = p["Jc"], p["Jd"]
    # operands enter as ARGUMENTS (device buffers), never as baked jit
    # constants — a closure-constant program at B=2048 exceeds the remote
    # compiler's upload limit (HTTP 413)
    if p["struct"] is not None:
        _, _, pairs = p["struct"]
        jfact = jax.jit(
            lambda hss, Hdd, Dxs, Dxd, Dd, Jcd, Jdd, jv:
            kkt_mds.factorize_saddle_device_mp_op(
                hss, Hdd, Dxs, Dxd, Dd, Jcd, Jdd, jv, pairs, z, z, z, z,
            )
        )
        args = (p["hss"], p["Hdd"], p["Dxs"], p["Dxd"], p["Dd"],
                Jc[:, ns:], Jd[:, ns:], p["js_vals"])
    else:
        jfact = jax.jit(
            lambda hss, Hdd, Dxs, Dxd, Dd, Jcs, Jcd, Jds, Jdd:
            kkt_mds.factorize_saddle_device_mp(
                hss, Hdd, Dxs, Dxd, Dd, Jcs, Jcd, Jds, Jdd, z, z, z, z,
            )
        )
        args = (p["hss"], p["Hdd"], p["Dxs"], p["Dxd"], p["Dd"],
                Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:])

    def fact():
        return jfact(*args)

    f = fact()
    float(f.d[0])  # force completion
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f = fact()
        float(f.d[0])
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 2)


def sparse_twin_obj(n_bus: int):
    """Cross-check: the same NLP through the fully sparse path (the
    reference's MDS-vs-other-formulation equivalence technique)."""
    import os

    os.environ["HIOP_TPU_PLATFORM"] = "cpu"  # host splu path
    from examples.acopf_mds import AcopfSparse
    from hiop_tpu import FilterIPMNewton, NlpSparse, NlpOptions

    o = NlpOptions()
    o.update(
        Hessian="analytical_exact", fixed_var="relax", tolerance=1e-6,
        mu0=0.1, verbosity_level=0,
    )
    t0 = time.time()
    r = FilterIPMNewton(NlpSparse(AcopfSparse(n_bus), o)).run()
    return dict(
        bench=f"sparse_twin{n_bus}", obj=float(r.obj), iters=int(r.iterations),
        wall_s=round(time.time() - t0, 1), status=r.status.name,
    )


def qn_core(precision: str):
    """QN iteration core at n=8.4M under a given matmul-precision default
    (VERDICT r2 #5: quantify the library-wide 'highest' override)."""
    import os

    os.environ["HIOP_TPU_MATMUL_PRECISION"] = precision
    import jax

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_step

    step, args = _build_step(n=8_388_608, m_eq=2, m_ineq=2, l_mem=4)
    jitted = jax.jit(step)
    out = jitted(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return dict(bench=f"qn_core_{precision}", n=8_388_608,
                ms_per_iter=round(best * 1e3, 3))


def mds_mp_parts(n_bus: int):
    """Timing decomposition of the fused mixed-precision KKT at the ACOPF
    shape: factorize, raw LDL triangular solve, IR-operator matvec
    (operator form when the triplet structure exists, dense otherwise),
    and the full IR-certified solve — each synced through a scalar fetch.
    These unit costs, multiplied by the per-iteration counters in the fused
    history buffer (n_refact, ir_primary, soc_rounds), give the
    per-phase decomposition of a fused iteration (docs/kernels.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from examples.acopf_mds import AcopfMds
    from hiop_tpu import NlpMDS, NlpOptions
    from hiop_tpu.kkt import mds as kkt_mds
    from hiop_tpu.linalg import ldl_blocked as _ldl

    o = NlpOptions()
    o.update(Hessian="analytical_exact", fixed_var="relax", verbosity_level=0)
    nlp = NlpMDS(AcopfMds(n_bus), o)
    nlp.finalize_initialization()
    p = _probe_operands(nlp)
    ns, nd, z = p["ns"], p["nd"], p["z"]
    Jc, Jd = p["Jc"], p["Jd"]
    use_op = p["struct"] is not None

    def timeit(fn, sync, reps=6):
        out = fn()
        float(sync(out))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            float(sync(out))
            best = min(best, time.perf_counter() - t0)
        return round(best * 1e3, 2)

    res = dict(bench=f"mds_mp_parts{n_bus}", op_form=use_op)
    rng = np.random.default_rng(0)
    if use_op:
        js_rows, js_cols, pairs = p["struct"]
        fact = jax.jit(lambda: kkt_mds.factorize_saddle_device_mp_op(
            p["hss"], p["Hdd"], p["Dxs"], p["Dxd"], p["Dd"],
            Jc[:, ns:], Jd[:, ns:], p["js_vals"], pairs, z, z, z, z,
        ))
        f = fact()
        float(f.d[0])
        res["fact_ms"] = timeit(fact, lambda f_: f_.d[0])
        n_sad = nd + nlp.m_eq + nlp.m_ineq
        rhs32 = jnp.asarray(rng.standard_normal(f.L.shape[0]), jnp.float32)
        rhs64 = jnp.asarray(rng.standard_normal(n_sad))
        lf = _ldl.LdlFactors(f.L, f.d, n_sad, jnp.asarray(0), f.ok)
        tri = jax.jit(lambda r: _ldl.ldl_solve(lf, r))
        res["ldl_solve_ms"] = timeit(lambda: tri(rhs32), lambda x: x[0])
        mv = jax.jit(lambda x: kkt_mds._op_matvec(f, js_rows, js_cols, x))
        res["ir_matvec_ms"] = timeit(lambda: mv(rhs64), lambda x: x[0])
        full = jax.jit(lambda r: kkt_mds._mp_solve_refined_op(
            f, js_rows, js_cols, r
        ))
        res["mp_solve_ms"] = timeit(lambda: full(rhs64), lambda t: t[0][0])
        out, cert, n_ir = full(rhs64)
        res["certified"] = bool(cert)
        res["solve_n_ir"] = int(n_ir)
        return res

    fact = jax.jit(lambda: kkt_mds.factorize_saddle_device_mp(
        p["hss"], p["Hdd"], p["Dxs"], p["Dxd"], p["Dd"],
        Jc[:, :ns], Jc[:, ns:], Jd[:, :ns], Jd[:, ns:], z, z, z, z,
    ))
    f = fact()
    float(f.d[0])
    res["fact_ms"] = timeit(fact, lambda f_: f_.d[0])

    n_sad = f.M.shape[0]
    rhs32 = jnp.asarray(rng.standard_normal(n_sad), jnp.float32)
    rhs64 = jnp.asarray(rng.standard_normal(n_sad))
    lf = _ldl.LdlFactors(f.L, f.d, n_sad, jnp.asarray(0), f.ok)
    tri = jax.jit(lambda r: _ldl.ldl_solve(lf, r))
    res["ldl_solve_ms"] = timeit(lambda: tri(rhs32), lambda x: x[0])
    mv = jax.jit(lambda x: f.M @ x)
    res["ir_matvec_ms"] = timeit(lambda: mv(rhs64), lambda x: x[0])
    full = jax.jit(
        lambda r: kkt_mds._mp_solve_refined(f, r)
    )
    res["mp_solve_ms"] = timeit(lambda: full(rhs64), lambda t: t[0][0])
    out, cert = full(rhs64)
    res["certified"] = bool(cert)
    return res


def chol_race(n: int, dtype: str = "float32"):
    """XLA potrf vs Pallas blocked Cholesky at one size, fresh process
    (VERDICT r2 #4, r3 #3).  Timing methodology: each rep fetches a scalar
    REDUCED FROM THE RESULT to the host, so the remote relay cannot report
    completion before the factorization actually ran (block_until_ready on
    this relay returns early for cached-executable dispatches).  The Pallas
    lane calls ``pallas_cholesky`` directly — above its VMEM budget it
    fails loudly here instead of silently dispatching XLA against itself.
    A sanity bound rejects timings implying more than the chip's absolute
    peak (BENCH_PEAK_TFLOPS, default 250 TF/s)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hiop_tpu.linalg import cholesky as chol

    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    A = jnp.asarray(a @ a.T + n * np.eye(n), dtype=dtype)
    flops = n ** 3 / 3.0
    peak = float(__import__("os").environ.get("BENCH_PEAK_TFLOPS", "250")) * 1e12

    def measure(fn):
        out = fn(A)
        float(jnp.sum(out[-1]))  # force real completion
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn(A)
            float(jnp.sum(out[-1]))
            best = min(best, time.perf_counter() - t0)
        if flops / best > peak:
            raise RuntimeError(
                f"implausible timing {best*1e3:.3f} ms = "
                f"{flops/best/1e12:.0f} TFLOP/s > peak {peak/1e12:.0f}"
            )
        return best

    t_xla = measure(jax.jit(jnp.linalg.cholesky))
    res = dict(bench=f"chol{n}_{dtype}", xla_ms=round(t_xla * 1e3, 3),
               xla_gflops=round(flops / t_xla / 1e9, 1))
    try:
        if 2 * n * n > chol._MAX_VMEM_ELEMS or n % chol._BLOCK:
            raise MemoryError(
                f"n={n} exceeds the Pallas whole-matrix VMEM budget "
                f"({chol._MAX_VMEM_ELEMS} elems / 2 buffers)"
            )
        t_pallas = measure(lambda M: chol.pallas_cholesky(M))
        res["pallas_ms"] = round(t_pallas * 1e3, 3)
        res["pallas_gflops"] = round(flops / t_pallas / 1e9, 1)
    except Exception as e:  # VMEM cliff etc. — report, never race XLA
        res["pallas_ms"] = None
        res["pallas_skip"] = f"{type(e).__name__}: {e}"
    return res


def main(argv):
    name = argv[0]
    t0 = time.time()
    if name.startswith("acopf"):
        kw = {}
        for a in argv[1:]:
            k, v = a.split("=", 1)
            kw[k] = int(v) if v.lstrip("-").isdigit() else v
        out = acopf_solve(int(name[5:]), **kw)
    elif name.startswith("sparse_twin"):
        out = sparse_twin_obj(int(name[11:]))
    elif name.startswith("qn_core_"):
        out = qn_core(name[len("qn_core_"):])
    elif name.startswith("mds_mp_parts"):
        out = mds_mp_parts(int(name[len("mds_mp_parts"):]))
    elif name.startswith("chol"):
        size, dt = name[4:].split("_")
        out = chol_race(int(size), dt)
    else:
        raise SystemExit(f"unknown sub-benchmark {name}")
    out["sub_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
