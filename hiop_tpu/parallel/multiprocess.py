"""Multi-process (multi-host) execution harness.

The reference distributes the quasi-Newton solver across MPI ranks and its
CI runs real 2-rank MPI jobs (reference CMakeLists.txt:508,512; SURVEY.md
§2.9).  The TPU-native equivalent is ``jax.distributed``: every process
calls :func:`initialize` once at startup, after which ``jax.devices()``
returns the *global* device list and a ``Mesh`` built over it spans all
processes — the unchanged solver code then runs distributed, with the
cross-process collectives riding the same psum/pmin paths that serve the
single-process mesh (hiop_tpu/parallel/mesh.py).

Two entry points:

* :func:`initialize` — call from each worker process.  On a real TPU pod
  slice all arguments are auto-detected from the TPU runtime; on CPU (the
  reference's MPI-CI analogue, and this repo's test harness) pass or
  env-configure coordinator/rank/size and a per-process virtual device
  count, and the cross-process collectives run over gloo.
* :func:`launch` — host-side launcher that spawns N copies of a worker
  script with the right environment (the ``mpirun -n N`` analogue), used
  by ``tests/test_multiprocess.py`` and the CLI::

      python -m hiop_tpu.parallel.multiprocess -n 2 -d 2 worker.py args...

Environment contract (read by :func:`initialize` when arguments are None):

==========================  =================================================
``HIOP_TPU_COORDINATOR``    ``host:port`` of the rank-0 coordinator
``HIOP_TPU_NUM_PROCS``      world size
``HIOP_TPU_PROC_ID``        this process's rank
``HIOP_TPU_LOCAL_DEVICES``  virtual CPU devices per process (CPU only)
``HIOP_TPU_PLATFORM``       force a platform ("cpu" for the test harness)
==========================  =================================================

See docs/distributed.md for the pod-slice runbook.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from typing import Optional, Sequence


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
    platform: Optional[str] = None,
) -> tuple[int, int]:
    """Join the distributed job.  Must run before any JAX backend use.

    Returns ``(process_id, num_processes)``.  With every argument None and
    no ``HIOP_TPU_*`` environment, this is a no-op single-process setup on
    a real TPU slice (``jax.distributed.initialize()`` auto-detects pods),
    and ``(0, 1)`` is returned for anything else.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("HIOP_TPU_COORDINATOR")
    num_processes = num_processes if num_processes is not None else _env_int("HIOP_TPU_NUM_PROCS")
    process_id = process_id if process_id is not None else _env_int("HIOP_TPU_PROC_ID")
    local_device_count = (
        local_device_count
        if local_device_count is not None
        else _env_int("HIOP_TPU_LOCAL_DEVICES")
    )
    platform = platform or os.environ.get("HIOP_TPU_PLATFORM")

    if platform:
        # config-level update: the environment may have pre-registered a
        # platform (e.g. the axon TPU plugin) via sitecustomize, in which
        # case the JAX_PLATFORMS env var alone is not honored.
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if local_device_count:
            # replace (not append): the launching environment may carry its
            # own device-count flag (e.g. the 8-device test harness)
            flags = [
                f
                for f in os.environ.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f
            ]
            flags.append(
                f"--xla_force_host_platform_device_count={local_device_count}"
            )
            os.environ["XLA_FLAGS"] = " ".join(flags)

    if coordinator_address is None and num_processes is None:
        # real TPU slice: jax auto-detects; single-host CPU: nothing to do
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return 0, 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return process_id or 0, num_processes or 1


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(
    worker_argv: Sequence[str],
    num_processes: int = 2,
    devices_per_process: int = 2,
    platform: str = "cpu",
    timeout: float = 600.0,
    extra_env: Optional[dict] = None,
    cwd: Optional[str] = None,
) -> list[subprocess.CompletedProcess]:
    """Spawn ``num_processes`` copies of ``python worker_argv...`` wired to
    one coordinator (the ``mpirun`` analogue).  Raises on any nonzero exit.
    Returns the per-rank CompletedProcess list (stdout/stderr captured).
    """
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            HIOP_TPU_COORDINATOR=f"127.0.0.1:{port}",
            HIOP_TPU_NUM_PROCS=str(num_processes),
            HIOP_TPU_PROC_ID=str(pid),
            HIOP_TPU_LOCAL_DEVICES=str(devices_per_process),
            HIOP_TPU_PLATFORM=platform,
        )
        if extra_env:
            env.update({k: str(v) for k, v in extra_env.items()})
        procs.append(
            subprocess.Popen(
                [sys.executable, *worker_argv],
                env=env,
                cwd=cwd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    failed = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            out, err = p.communicate()
            failed.append((pid, "timeout", err))
        results.append(
            subprocess.CompletedProcess(p.args, p.returncode, stdout=out, stderr=err)
        )
    for pid, r in enumerate(results):
        if r.returncode != 0 and not any(f[0] == pid for f in failed):
            failed.append((pid, f"rc={r.returncode}", r.stderr))
    if failed:
        msgs = "\n".join(
            f"-- rank {pid} {why}:\n{(err or '')[-2000:]}" for pid, why, err in failed
        )
        raise RuntimeError(f"multiprocess launch failed:\n{msgs}")
    return results


def rank0_print(*args, **kwargs) -> None:
    """Print only on process 0 (the reference's rank-0 logger convention)."""
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs)


def allgather_json(obj) -> list:
    """Gather a small JSON-serializable object from every process to all
    processes (diagnostics helper for cross-rank result checks)."""
    import jax
    from jax.experimental import multihost_utils
    import numpy as np

    payload = json.dumps(obj).encode()
    n = jax.process_count()
    maxlen = int(
        multihost_utils.process_allgather(np.asarray(len(payload))).max()
    )
    buf = np.zeros(maxlen, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    lens = multihost_utils.process_allgather(np.asarray(len(payload)))
    bufs = multihost_utils.process_allgather(buf)
    out = []
    for i in range(n):
        out.append(json.loads(bytes(bufs[i, : int(lens[i])]).decode()))
    return out


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m hiop_tpu.parallel.multiprocess",
        description="Launch N coordinated worker processes (mpirun analogue).",
    )
    ap.add_argument("-n", "--num-processes", type=int, default=2)
    ap.add_argument("-d", "--devices-per-process", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("worker", nargs=argparse.REMAINDER, help="worker script + args")
    args = ap.parse_args(argv)
    if not args.worker:
        ap.error("missing worker script")
    results = launch(
        args.worker,
        num_processes=args.num_processes,
        devices_per_process=args.devices_per_process,
        platform=args.platform,
        timeout=args.timeout,
    )
    for pid, r in enumerate(results):
        sys.stdout.write(f"===== rank {pid} =====\n{r.stdout}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
