"""Static visualization: workspace cost contours, environment, results.

Capability parity with the reference's visualization stack
(ref: visualization/visualization.py, env_vis.py), re-designed:

* reads the same decoupling text formats (trajectory_result.txt /
  trajectory_series.txt, ref: main.py:145-153),
* the cost contour grid is ONE batched evaluation over the whole grid
  (the reference brute-forces 6,561 single-point jit calls,
  ref: visualization/visualization.py:49-55),
* matplotlib imported lazily with the Agg backend so the core engine never
  depends on a display.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import PlannerConfig
from ..models import robot
from ..ops.costs import obstacle_cost_v
from ..ops.scenario import Scenario


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def cost_grid(
    scn: Scenario, extent: float = 4.0, resolution: int = 81
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Workspace obstacle-cost field on a grid — one vectorized evaluation.

    Returns (xs, ys, cost[res, res])."""
    xs = np.linspace(-extent, extent, resolution)
    ys = np.linspace(-extent, extent, resolution)
    gx, gy = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()]))  # (2, res*res)
    cost = obstacle_cost_v(pts, scn.obstacles, scn.obstacle_weight)
    return xs, ys, np.asarray(cost).reshape(resolution, resolution)


def cost_gradient_grid(
    scn: Scenario, extent: float = 4.0, resolution: int = 21
):
    """Negative cost-gradient field for quiver plots (capability of
    ref: visualization/env_vis.py:105-119)."""
    from ..ops.costs import obstacle_cost_vg

    xs = np.linspace(-extent, extent, resolution)
    ys = np.linspace(-extent, extent, resolution)
    gx, gy = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()]))
    _, grad = obstacle_cost_vg(pts, scn.obstacles, scn.obstacle_weight)
    g = -np.asarray(grad).reshape(2, resolution, resolution)
    return xs, ys, g


def draw_cost_contour(ax, scn: Scenario, extent: float = 4.0,
                      resolution: int = 81, show_obstacles: bool = True):
    xs, ys, c = cost_grid(scn, extent, resolution)
    cf = ax.contourf(xs, ys, c, levels=20, cmap="viridis")
    if show_obstacles:
        ax.scatter(
            np.asarray(scn.obstacles[:, 0])[np.asarray(scn.obstacle_weight) > 0],
            np.asarray(scn.obstacles[:, 1])[np.asarray(scn.obstacle_weight) > 0],
            c="red", marker="x", s=30, label="obstacles",
        )
    return cf


def draw_arm(ax, cfg: PlannerConfig, config: np.ndarray, **kw):
    """Draw one arm pose (all links) at joint configuration ``config`` (J,)."""
    pts = robot.fk_all_joints(cfg, jnp.asarray(config)[None, :])  # (J, 2, 1)
    xs = [0.0] + [float(pts[k, 0, 0]) for k in range(cfg.n_joints)]
    ys = [0.0] + [float(pts[k, 1, 0]) for k in range(cfg.n_joints)]
    ax.plot(xs, ys, marker="o", **kw)


def plot_environment(
    cfg: PlannerConfig,
    scn: Scenario,
    out_path: str = "environment.png",
    show_gradient: bool = False,
    trajectory: Optional[np.ndarray] = None,
    show_legend: bool = True,
    show_sgb: bool = True,
    show_sg_robot: bool = True,
    show_obstacles: bool = False,
    show_straight_line: bool = True,
    show_final_ee: bool = True,
    show_final_robot: bool = False,
):
    """Environment overview (capability C10, ref: visualization/env_vis.py):
    cost contour with the reference's full toggle set
    (ref: env_vis.py:45-52 — legend / start-goal markers / start-goal arm
    poses / obstacle scatter / straight line / gradient quiver / final EE
    path / final arm poses)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    draw_cost_contour(ax, scn, show_obstacles=show_obstacles)
    if show_gradient:
        xs, ys, g = cost_gradient_grid(scn)
        gx, gy = np.meshgrid(xs, ys)
        ax.quiver(gx, gy, g[0], g[1], color="white", alpha=0.6)
    start_ee = np.asarray(robot.fk(cfg, jnp.asarray(scn.start)[None, :]))[:, 0]
    goal_ee = np.asarray(robot.fk(cfg, jnp.asarray(scn.goal)[None, :]))[:, 0]
    if show_sgb:
        ax.scatter(*start_ee, c="lime", s=60, zorder=5, label="start")
        ax.scatter(*goal_ee, c="orange", s=60, zorder=5, label="goal")
    if show_straight_line:
        # The reference's "straight line" is straight in JOINT space — the
        # quintic-smoothstep interpolation the optimizer warm-starts from —
        # whose FK image is a curve in the workspace (ref: env_vis.py:169-174
        # plots fk of the initial joint-space trajectory).
        t = np.linspace(0.0, 1.0, 50)
        c = (6 * t**5 - 15 * t**4 + 10 * t**3)[:, None]  # ref: trajectory.py:38
        line = np.asarray(scn.start)[None, :] + c * (
            np.asarray(scn.goal) - np.asarray(scn.start)
        )[None, :]
        ee_line = np.asarray(robot.fk(cfg, jnp.asarray(line)))
        ax.plot(ee_line[0], ee_line[1], "w--", lw=1, label="straight line")
    if show_sg_robot:
        draw_arm(ax, cfg, np.asarray(scn.start), color="lime",
                 label="start pose")
        draw_arm(ax, cfg, np.asarray(scn.goal), color="orange",
                 label="goal pose")
    if trajectory is not None:
        traj = jnp.asarray(trajectory)
        if show_final_ee:
            ee = np.asarray(robot.fk(cfg, traj))
            ax.plot(ee[0], ee[1], "w-", lw=2, label="EE path")
        if show_final_robot:
            T = traj.shape[0]
            for t in range(0, T, max(1, T // 12)):
                draw_arm(ax, cfg, np.asarray(traj[t]),
                         alpha=0.15 + 0.85 * t / T, color="tab:cyan")
    ax.set_aspect("equal")
    if show_legend:
        ax.legend(loc="upper left")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_result(
    cfg: PlannerConfig,
    scn: Scenario,
    trajectory: np.ndarray,
    out_path: str = "result.png",
):
    """2x3 result figure (capability C9, ref: visualization/visualization.py):
    contour + straight-line vs final EE path; arm poses over time;
    per-timestep obstacle cost; joint positions; finite-difference joint
    velocities."""
    plt = _plt()
    traj = jnp.asarray(trajectory)
    T = traj.shape[0]
    ee = np.asarray(robot.fk(cfg, traj))
    fig, axes = plt.subplots(2, 3, figsize=(18, 10))

    ax = axes[0, 0]
    draw_cost_contour(ax, scn)
    start_ee = np.asarray(robot.fk(cfg, jnp.asarray(scn.start)[None, :]))[:, 0]
    goal_ee = np.asarray(robot.fk(cfg, jnp.asarray(scn.goal)[None, :]))[:, 0]
    ax.plot([start_ee[0], goal_ee[0]], [start_ee[1], goal_ee[1]],
            "w--", lw=1, label="straight line")
    ax.plot(ee[0], ee[1], "r-", lw=2, label="EE path")
    ax.scatter(*start_ee, c="lime", s=60, zorder=5, label="start")
    ax.scatter(*goal_ee, c="orange", s=60, zorder=5, label="goal")
    ax.set_aspect("equal")
    ax.set_title("workspace cost + EE path")
    ax.legend(loc="upper left", fontsize=8)

    ax = axes[0, 1]
    for t in range(0, T, max(1, T // 12)):
        draw_arm(ax, cfg, np.asarray(traj[t]), alpha=0.15 + 0.85 * t / T,
                 color="tab:blue")
    ax.set_aspect("equal")
    ax.set_title("arm poses over time")

    ax = axes[0, 2]
    cost_t = np.asarray(
        obstacle_cost_v(jnp.asarray(ee), scn.obstacles, scn.obstacle_weight)
    )
    ax.plot(cost_t)
    ax.set_title("per-timestep obstacle cost")
    ax.set_xlabel("timestep")

    ax = axes[1, 0]
    for j in range(cfg.n_joints):
        ax.plot(np.asarray(traj[:, j]), label=f"joint {j+1}")
    ax.axhline(cfg.max_joint_position, color="r", ls="--", lw=0.8)
    ax.axhline(cfg.min_joint_position, color="r", ls="--", lw=0.8)
    ax.set_title("joint positions")
    ax.legend(fontsize=8)

    ax = axes[1, 1]
    # finite-difference velocities like the reference
    # (ref: visualization/visualization.py:155)
    fd_vel = np.diff(np.asarray(traj), axis=0) * (T - 1)
    for j in range(cfg.n_joints):
        ax.plot(fd_vel[:, j], label=f"joint {j+1}")
    ax.axhline(cfg.max_joint_velocity, color="r", ls="--", lw=0.8)
    ax.axhline(-cfg.max_joint_velocity, color="r", ls="--", lw=0.8)
    ax.set_title("joint velocities (finite difference)")
    ax.legend(fontsize=8)

    ax = axes[1, 2]
    ax.axis("off")
    ax.text(0.02, 0.8, f"T={T}  J={cfg.n_joints}", fontsize=12)
    ax.text(0.02, 0.6, f"max |v| = {np.abs(fd_vel).max():.3f}", fontsize=12)
    ax.text(0.02, 0.4, f"max obstacle cost = {cost_t.max():.3f}", fontsize=12)

    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
