"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (SURVEY.md §4 TPU translation).

Note: the environment's sitecustomize registers the 'axon' TPU platform and
forces jax_platforms='axon,cpu'; we override back to CPU here, *before* any
backend is initialized, and expose 8 virtual CPU devices."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
