"""Result persistence in the reference's text formats.

The reference decouples solver and visualization through two text files
(ref: main.py:145-153):

* ``trajectory_result.txt`` — the converged trajectory, (T, J) floats,
* ``trajectory_series.txt`` — per-iteration trajectory snapshots flattened
  to (n_iters, J*T).

We keep both formats (so the reference's downstream tooling keeps working)
and add an .npz container with full solver state/stats for ours.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PlannerConfig
from ..models.rkhs import Basis, evaluate
from ..solvers.common import SolveResult


def save_trajectory_result(
    path: str, cfg: PlannerConfig, basis: Basis, alpha: jnp.ndarray
) -> np.ndarray:
    """Write the (T, J) trajectory in the reference format (ref: main.py:148)."""
    traj, _ = evaluate(cfg, basis, alpha)
    arr = np.asarray(traj)
    np.savetxt(path, arr)
    return arr


def load_trajectory_result(path: str) -> np.ndarray:
    return np.loadtxt(path)


def save_trajectory_series(
    path: str, cfg: PlannerConfig, basis: Basis, alphas: Sequence[jnp.ndarray]
) -> np.ndarray:
    """Write per-iteration snapshots, (n, J*T) flattened (ref: main.py:150-153)."""
    trajs = [np.asarray(evaluate(cfg, basis, a)[0]) for a in alphas]
    arr = np.stack(trajs).reshape(len(trajs), -1)
    np.savetxt(path, arr)
    return arr


def load_trajectory_series(path: str, cfg: PlannerConfig) -> np.ndarray:
    """Returns (n_iters, T, J)."""
    flat = np.loadtxt(path)
    if flat.ndim == 1:
        flat = flat[None]
    return flat.reshape(flat.shape[0], cfg.n_timesteps, cfg.n_joints)


def save_solve_npz(path: str, result: SolveResult) -> None:
    """Full-fidelity result container (alpha + stats), single or batched."""
    np.savez(
        path,
        alpha=np.asarray(result.alpha),
        outer_iters=np.asarray(result.stats.outer_iters),
        inner_iters=np.asarray(result.stats.inner_iters),
        converged=np.asarray(result.stats.converged),
        final_cost=np.asarray(result.stats.final_cost),
    )


def load_solve_npz(path: str):
    data = np.load(path)
    from ..solvers.common import SolveStats

    return SolveResult(
        alpha=jnp.asarray(data["alpha"]),
        stats=SolveStats(
            outer_iters=jnp.asarray(data["outer_iters"]),
            inner_iters=jnp.asarray(data["inner_iters"]),
            converged=jnp.asarray(data["converged"]),
            final_cost=jnp.asarray(data["final_cost"]),
        ),
    )
