"""Scenario = the runtime environment pytree.

Capability parity with the reference's Environment holder
(ref: environment.py:11-29), with the load-bearing design decision kept and
hardened: start/goal/obstacles are *traced runtime inputs*, never compile-time
constants, so the environment can change every solve without recompilation
(ref: README.md:25-26).

New vs the reference: the obstacle array is padded to a static
``cfg.max_obstacles`` bound with a per-obstacle weight vector.  A weight of 0
removes an obstacle from both cost and gradient, so obstacle sets of *any*
size (up to the bound) share one compiled executable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PlannerConfig

# The reference's fixed demo environment (ref: environment.py:14-29).
REFERENCE_START = (0.0, 0.0, 0.0)
REFERENCE_GOAL = (1.2, 0.8, 0.3)
REFERENCE_OBSTACLES = (
    (2, -3), (-2, 2), (3, 3), (-1, -2), (-2, 1), (-1, -1),
    (-2, -3), (-2, 0), (1, 3), (3, 2), (2, 3),
)


class Scenario(NamedTuple):
    """One planning problem instance (runtime data; all leaves traced).

    Attributes:
      start:      (J,) start joint configuration.
      goal:       (J,) goal joint configuration.
      obstacles:  (O_max, 2) padded point-obstacle positions.
      obstacle_weight: (O_max,) 1.0 for live obstacles, 0.0 for padding.
    """

    start: jnp.ndarray
    goal: jnp.ndarray
    obstacles: jnp.ndarray
    obstacle_weight: jnp.ndarray


def make_scenario(
    cfg: PlannerConfig,
    start,
    goal,
    obstacles,
    obstacle_weight: Optional[jnp.ndarray] = None,
) -> Scenario:
    """Build a Scenario, padding the obstacle set to ``cfg.max_obstacles``."""
    start = jnp.asarray(start, dtype=jnp.float32)
    goal = jnp.asarray(goal, dtype=jnp.float32)
    obstacles = jnp.asarray(obstacles, dtype=jnp.float32).reshape(-1, 2)
    n = obstacles.shape[0]
    if n > cfg.max_obstacles:
        raise ValueError(
            f"{n} obstacles exceed cfg.max_obstacles={cfg.max_obstacles}"
        )
    if obstacle_weight is None:
        obstacle_weight = jnp.ones((n,), dtype=jnp.float32)
    pad = cfg.max_obstacles - n
    # Padding obstacles sit at a harmless location with weight 0; they
    # contribute exactly 0 to cost and gradient.
    obstacles = jnp.concatenate(
        [obstacles, jnp.zeros((pad, 2), dtype=jnp.float32)], axis=0
    )
    obstacle_weight = jnp.concatenate(
        [obstacle_weight.astype(jnp.float32), jnp.zeros((pad,), dtype=jnp.float32)]
    )
    return Scenario(start, goal, obstacles, obstacle_weight)


def reference_scenario(cfg: PlannerConfig) -> Scenario:
    """The reference's demo problem (ref: environment.py:12-29)."""
    return make_scenario(cfg, REFERENCE_START, REFERENCE_GOAL, REFERENCE_OBSTACLES)


def random_scenarios(
    cfg: PlannerConfig,
    key: jax.Array,
    batch: int,
    n_obstacles: Optional[int] = None,
    workspace_radius: float = 3.5,
) -> Scenario:
    """A batch of randomized scenarios (leading axis ``batch`` on every leaf).

    Used by the batched/sharded engines and benchmarks (BASELINE.json
    configs[2] and [4]).  Starts/goals are sampled inside the joint box;
    obstacles uniformly in a workspace square.
    """
    if n_obstacles is None:
        n_obstacles = len(REFERENCE_OBSTACLES)
    if n_obstacles > cfg.max_obstacles:
        raise ValueError("n_obstacles exceeds cfg.max_obstacles")
    k1, k2, k3 = jax.random.split(key, 3)
    lo, hi = cfg.min_joint_position, cfg.max_joint_position
    # keep away from the box edge so limit constraints start satisfiable
    margin = 0.1 * (hi - lo)
    start = jax.random.uniform(
        k1, (batch, cfg.n_joints), minval=lo + margin, maxval=hi - margin
    )
    goal = jax.random.uniform(
        k2, (batch, cfg.n_joints), minval=lo + margin, maxval=hi - margin
    )
    obstacles = jax.random.uniform(
        k3,
        (batch, cfg.max_obstacles, 2),
        minval=-workspace_radius,
        maxval=workspace_radius,
    )
    weight = jnp.broadcast_to(
        (np.arange(cfg.max_obstacles) < n_obstacles).astype(np.float32),
        (batch, cfg.max_obstacles),
    )
    return Scenario(
        start.astype(jnp.float32),
        goal.astype(jnp.float32),
        obstacles.astype(jnp.float32),
        weight,
    )


def replicate_scenario(scn: Scenario, batch: int) -> Scenario:
    """Tile a single scenario along a new leading batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), scn
    )
