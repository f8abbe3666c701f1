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
