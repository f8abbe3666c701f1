"""Test configuration: force the CPU backend with 8 virtual devices.

Tests never require TPU hardware: single-chip numerics run on one virtual CPU
device; multi-chip sharding tests use an 8-device CPU mesh — the standard JAX
pattern for testing collectives clusterlessly.

NOTE: this environment's sitecustomize may import jax and register an
accelerator plugin before pytest starts, so setting JAX_PLATFORMS here can be
too late; we also flip the platform via jax.config (which works post-import).
"""

import os

# Must be set before the CPU client is instantiated (first jax computation).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Stash the launch platform so subprocess-based tests (the real-TPU smoke
# gate) can restore the default environment.
os.environ.setdefault("_PRE_CONFTEST_JAX_PLATFORMS",
                      os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs
