"""Device-mesh construction and sharding helpers.

The scaling story (SURVEY.md §2): scenarios are embarrassingly parallel, so
the mesh has one data axis ("scenario") over all devices; XLA partitions the
batched solver across it with zero resharding, and collectives are only used
for fleet-level statistics (see sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices with a single scenario axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every leaf over the scenario axis."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    return jax.device_put(tree, scenario_sharding(mesh))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
