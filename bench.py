"""Benchmark: IPM iteration throughput of the quasi-Newton solver core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is the per-iteration KKT+residual core (the hot path
of SURVEY.md §3.2) on a dense-constrained problem sized to the machine.
vs_baseline compares against the reference's published QN strong-scaling
point of 0.259 s/iter at 288 cores for n=33.5M (BASELINE.md) normalized to
per-variable throughput: 33.5e6/0.259 = 129.3e6 variable-updates/s.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _build_step

    n = 2_000_000
    m_eq, m_ineq = 8, 8
    try:
        step, args = _build_step(n=n, m_eq=m_eq, m_ineq=m_ineq)
        jitted = jax.jit(step)
        out = jitted(*args)
        jax.block_until_ready(out)
    except Exception:
        # fall back to a smaller problem (e.g. tight-memory hosts)
        n = 200_000
        step, args = _build_step(n=n, m_eq=m_eq, m_ineq=m_ineq)
        jitted = jax.jit(step)
        out = jitted(*args)
        jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    iters_per_s = 1.0 / dt
    var_updates_per_s = n / dt
    baseline_var_updates = 33.5e6 / 0.259  # reference @288 CPU cores
    print(
        json.dumps(
            {
                "metric": "qn_ipm_iteration_core_throughput",
                "value": round(iters_per_s, 3),
                "unit": f"iters/s (n={n}, m={m_eq + m_ineq}, {dt*1e3:.2f} ms/iter)",
                "vs_baseline": round(var_updates_per_s / baseline_var_updates, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
