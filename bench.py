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
import time

import numpy as np


def _measure(jitted, args, iters):
    import jax

    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    from __graft_entry__ import _build_mds_step

    shapes = [(8192, 1024, 128, 64), (2048, 256, 64, 32)]
    dt = None
    used = None
    for ns, nd, me, mi in shapes:
        try:
            step, args = _build_mds_step(ns=ns, nd=nd, m_eq=me, m_ineq=mi)
            jitted = jax.jit(step)
            dt = _measure(jitted, args, iters=20)
            used = (ns, nd, me, mi)
            break
        except Exception:
            continue
    if dt is None:
        print(json.dumps({"metric": "mds_kkt_core", "value": 0.0, "unit": "failed", "vs_baseline": 0.0}))
        return

    ns, nd, me, mi = used
    print(
        json.dumps(
            {
                "metric": "mds_newton_kkt_factorize_solve",
                "value": round(1.0 / dt, 3),
                "unit": f"iters/s (ns={2*ns} sparse + nd={nd} dense vars, m={me+mi}, {dt*1e3:.2f} ms/iter)",
                "vs_baseline": round(0.259 / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
