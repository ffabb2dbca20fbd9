"""Test harness: force an 8-device virtual CPU mesh before jax import.

The TPU-native answer to "test multi-chip without a cluster" (SURVEY.md §4):
every sharding test runs against 8 virtual CPU devices so per-shard top-k,
allgather merges and shard_map partitioning are exercised for real.
"""

import os

# force CPU regardless of ambient JAX_PLATFORMS: the dev box force-registers
# a TPU tunnel platform ("axon") that ignores the env var — only
# jax.config.update reliably overrides it.  Tests must never compile over
# the tunnel (it is ~100x slower and single-device).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
