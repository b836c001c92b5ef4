"""Execution-space resolution (L0).

Parity with ``ExecSpaceInfo`` / ``ExecSpace<MEMBACKEND,EXECPOLICY>``
(/root/reference/src/ExecBackends/ExecSpace.hpp:75,346): the reference maps
the string options (mem_space, mem_backend, exec_policies, compute_mode) to
a (memory backend, exec policy) pair carried by every LA object. On TPU the
axes collapse to:

- **device**: which jax device the solver's arrays live on (compute_mode:
  'cpu' pins host, 'auto'/'tpu'/'hybrid'/'gpu' prefer the accelerator);
- **kernel backend**: XLA-fused jit vs Pallas kernels for the hot dense
  factorizations (exec_policies);
- **dtype policy**: f64 everywhere vs f32-factorize/f64-refine
  (kkt_fact_dtype — the mem_space 'um'/'device' distinction has no TPU
  meaning and is accepted as a no-op).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax


@dataclass
class ExecSpaceInfo:
    device: Optional[jax.Device]
    kernel_backend: str   # 'xla' | 'pallas'
    fact_dtype: str       # 'float64' | 'float32'

    @staticmethod
    def from_options(options) -> "ExecSpaceInfo":
        compute = options.str_("compute_mode")
        device = None
        try:
            # local_devices, not devices: in a multi-process job (jax
            # distributed, SURVEY.md §2.9) the global list contains
            # non-addressable peers and device_put to them is an error
            if compute == "cpu":
                device = jax.local_devices(backend="cpu")[0]
            elif compute in ("auto", "tpu", "gpu", "hybrid"):
                accel = [d for d in jax.local_devices() if d.platform != "cpu"]
                device = accel[0] if accel else jax.local_devices()[0]
        except RuntimeError:
            device = None
        backend = "pallas" if options.str_("exec_policies") == "pallas" else "xla"
        return ExecSpaceInfo(
            device=device,
            kernel_backend=backend,
            fact_dtype=options.str_("kkt_fact_dtype"),
        )

    def place(self, a):
        """Put an array on the resolved device (no-op when unresolved)."""
        if self.device is None:
            return a
        return jax.device_put(a, self.device)


def on_accelerator() -> bool:
    """True when an accelerator (TPU, incl. the axon plugin platform) is
    among the visible devices — the shared probe for 'does the device tier
    of a solver ladder / the Pallas kernel path apply here'."""
    import jax as _jax

    return any(d.platform in ("tpu", "axon") for d in _jax.devices())
