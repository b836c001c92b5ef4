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

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    """Apply @pytest.mark.slow from the checked-in duration-based list
    (tests/slow_tests.txt) so `pytest -q` stays under ~5 minutes while
    `pytest -m slow` covers the long tail. New tests default to the fast
    tier until the list is regenerated (--durations=0)."""
    import pytest

    try:
        with open(_SLOW_LIST) as f:
            slow = {
                line.strip()
                for line in f
                if line.strip() and not line.startswith("#")
            }
    except OSError:
        return
    for item in items:
        # Node ids in slow_tests.txt carry a "tests/" prefix (rootdir = repo
        # root). When pytest is invoked from inside tests/, node ids lack the
        # prefix — normalize both ways so markers apply regardless of cwd.
        nid = item.nodeid
        if nid in slow or f"tests/{nid}" in slow or nid.removeprefix("tests/") in slow:
            item.add_marker(pytest.mark.slow)
