"""Multi-host launch support.

The reference is single-process (SURVEY.md §2 "native & parallelism:
none").  For pod-scale runs each host process calls
:func:`initialize_distributed` once before any JAX computation; afterwards
``jax.devices()`` spans the full slice and the mesh/sharded solvers in this
package scale across hosts with ICI/DCN collectives inserted by XLA.

Host-count simulation for tests (no pod needed): set
``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``
and build the mesh over the N virtual devices (tests/test_sharding.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (multi-host).

    On TPU pods all arguments are auto-detected from the environment; on
    other platforms pass them explicitly.  No-op if already initialized or
    running single-process with no coordinator configured.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Single-process environment (no coordinator): run locally.
        pass


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global scenario batch owned by this host process."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
