"""Visualization smoke tests (Agg backend): all four capabilities render."""

import os

import numpy as np
import pytest

import irm_motion_planning_tpu as mp

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from irm_motion_planning_tpu.visualization import animate, plots  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = mp.PlannerConfig()
    scn = mp.reference_scenario(cfg)
    basis = mp.make_basis(cfg)
    alpha = mp.init_alpha(cfg, basis, scn.start, scn.goal)
    traj, _ = mp.evaluate(cfg, basis, alpha)
    return cfg, scn, np.asarray(traj)


def test_cost_grid_vectorized(setup):
    cfg, scn, traj = setup
    xs, ys, c = plots.cost_grid(scn, resolution=41)
    assert c.shape == (41, 41)
    assert np.isfinite(c).all() and (c > 0).all()
    # peak cost near an obstacle beats far-field cost
    assert c.max() > 3 * c.min()


def test_plot_result(tmp_path, setup):
    cfg, scn, traj = setup
    out = plots.plot_result(cfg, scn, traj, str(tmp_path / "r.png"))
    assert os.path.getsize(out) > 10_000


def test_plot_environment_with_gradient(tmp_path, setup):
    cfg, scn, traj = setup
    out = plots.plot_environment(
        cfg, scn, str(tmp_path / "e.png"), show_gradient=True, trajectory=traj
    )
    assert os.path.getsize(out) > 10_000


def test_plot_environment_toggle_matrix(tmp_path, setup):
    """The reference's full env_vis toggle set (ref: env_vis.py:45-52) is
    honored: EACH toggle, flipped alone against the baseline, changes the
    rendered figure (a single ignored toggle fails its own case — flipping
    all of them at once could mask one)."""
    cfg, scn, traj = setup
    base = plots.plot_environment(
        cfg, scn, str(tmp_path / "base.png"), trajectory=traj
    )
    assert os.path.getsize(base) > 10_000
    base_bytes = open(base, "rb").read()
    flips = {
        "show_legend": False,
        "show_sgb": False,
        "show_sg_robot": False,
        "show_obstacles": True,
        "show_straight_line": False,
        "show_final_ee": False,
        "show_final_robot": True,
        "show_gradient": True,
    }
    for name, value in flips.items():
        out = plots.plot_environment(
            cfg, scn, str(tmp_path / f"{name}.png"), trajectory=traj,
            **{name: value},
        )
        assert os.path.getsize(out) > 10_000
        assert open(out, "rb").read() != base_bytes, f"{name} had no effect"


def test_vis_cli_env_mode(tmp_path, setup):
    from irm_motion_planning_tpu.visualization import cli as vis_cli

    cfg, scn, traj = setup
    inp = tmp_path / "traj.txt"
    np.savetxt(inp, traj)
    out = tmp_path / "env.png"
    rc = vis_cli.main([
        "--mode", "env", "--input", str(inp), "--out", str(out),
        "--vis-obstacles", "true", "--vis-final-robot", "true",
        "--vis-legend", "false",
    ])
    assert rc == 0 and os.path.getsize(out) > 10_000


def test_animations(tmp_path, setup):
    cfg, scn, traj = setup
    short = traj[::10]
    out = animate.animate_robot_movement(
        cfg, scn, short, str(tmp_path / "m.gif"), fps=5
    )
    assert os.path.getsize(out) > 5_000
    series = np.stack([traj, traj * 0.9, traj * 0.8])
    out = animate.animate_series(cfg, scn, series, str(tmp_path / "s.gif"), fps=2)
    assert os.path.getsize(out) > 5_000
