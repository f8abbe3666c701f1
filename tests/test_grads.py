"""Gradient checks: every hand-derived analytical gradient against jax
autodiff — the validation methodology the reference describes
(ref: DevBlog blog-post.html:278) turned into a real suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.ops import costs


@pytest.fixture(scope="module")
def setup():
    cfg = mp.PlannerConfig()
    basis = mp.make_basis(cfg)
    scn = mp.reference_scenario(cfg)
    pen = mp.initial_penalty(cfg)
    alpha = mp.init_alpha(cfg, basis, scn.start, scn.goal)
    traj, vel = mp.evaluate(cfg, basis, alpha)
    return cfg, basis, scn, pen, alpha, traj, vel


def _rel_close(a, b, tol):
    denom = max(float(jnp.abs(b).max()), 1e-12)
    assert float(jnp.abs(a - b).max()) / denom < tol


def test_obstacle_cost_grad(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    ana = costs.trajectory_obstacle_cost_g(cfg, traj, scn)
    auto = jax.grad(lambda tr: costs.trajectory_obstacle_cost(cfg, tr, scn))(traj)
    _rel_close(ana, auto, 1e-4)


def test_start_goal_cost_grad(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    ana = costs.start_goal_cost_g(traj, scn.start, scn.goal)
    auto = jax.grad(lambda tr: costs.start_goal_cost(tr, scn.start, scn.goal))(traj)
    _rel_close(ana, auto, 1e-5)


def test_start_goal_velocity_cost_grad(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    ana = costs.start_goal_velocity_cost_g(vel)
    auto = jax.grad(costs.start_goal_velocity_cost)(vel)
    _rel_close(ana, auto, 1e-5)


def test_joint_position_limit_cost_grad(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    # push some points outside the safety band so the violation mask is active
    traj = traj.at[10].set(2.5).at[20].set(-1.5)
    ana = costs.joint_position_limit_cost_g(cfg, traj)
    auto = jax.grad(lambda tr: costs.joint_position_limit_cost(cfg, tr))(traj)
    _rel_close(ana, auto, 1e-5)
    assert float(jnp.abs(ana).max()) > 0  # mask actually active


def test_joint_velocity_limit_cost_grad(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    vel = vel.at[5].set(8.0)
    ana = costs.joint_velocity_limit_cost_g(cfg, vel)
    auto = jax.grad(lambda v: costs.joint_velocity_limit_cost(cfg, v))(vel)
    _rel_close(ana, auto, 1e-5)
    assert float(jnp.abs(ana).max()) > 0


def test_total_grad_vs_autodiff(setup):
    """The chain-ruled alpha-space gradient (ref: trajectory.py:284-297)
    against jax.grad of the raw total cost."""
    cfg, basis, scn, pen, alpha, traj, vel = setup
    ana = mp.total_cost_grad(cfg, basis, scn, pen, alpha)
    auto = jax.grad(
        lambda a: costs.total_cost_autodiff_only(cfg, basis, scn, pen, a)
    )(alpha)
    _rel_close(ana, auto, 1e-4)


def test_total_grad_at_perturbed_points(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    key = jax.random.PRNGKey(7)
    for k in jax.random.split(key, 3):
        a = alpha + 10.0 * jax.random.normal(k, alpha.shape)
        ana = mp.total_cost_grad(cfg, basis, scn, pen, a)
        auto = jax.grad(
            lambda x: costs.total_cost_autodiff_only(cfg, basis, scn, pen, x)
        )(a)
        _rel_close(ana, auto, 1e-3)


def test_fused_cost_and_grad_consistency(setup):
    cfg, basis, scn, pen, alpha, traj, vel = setup
    c1 = mp.total_cost(cfg, basis, scn, pen, alpha)
    g1 = mp.total_cost_grad(cfg, basis, scn, pen, alpha)
    c2, g2 = mp.cost_and_grad(cfg, basis, scn, pen, alpha)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)


def test_custom_vjp_returns_analytical_grad(setup):
    """jax.grad(total_cost) must dispatch to the hand-derived gradient."""
    cfg, basis, scn, pen, alpha, traj, vel = setup
    g_vjp = jax.grad(lambda a: mp.total_cost(cfg, basis, scn, pen, a))(alpha)
    g_ana = mp.total_cost_grad(cfg, basis, scn, pen, alpha)
    np.testing.assert_array_equal(np.asarray(g_vjp), np.asarray(g_ana))


def test_grad_with_nonuniform_obstacle_weights(setup):
    """Weighted (soft) obstacles: gradient must respect fractional weights."""
    cfg, basis, scn, pen, alpha, traj, vel = setup
    w = scn.obstacle_weight.at[0].set(0.3)
    scn2 = scn._replace(obstacle_weight=w)
    ana = mp.total_cost_grad(cfg, basis, scn2, pen, alpha)
    auto = jax.grad(
        lambda a: costs.total_cost_autodiff_only(cfg, basis, scn2, pen, a)
    )(alpha)
    _rel_close(ana, auto, 1e-4)


def test_penalty_scaling_linear(setup):
    """Cost must be affine in the penalty multipliers (penalty method)."""
    cfg, basis, scn, pen, alpha, traj, vel = setup
    c0 = mp.total_cost(cfg, basis, scn, mp.Penalty(jnp.float32(0), jnp.float32(0)), alpha)
    c1 = mp.total_cost(cfg, basis, scn, mp.Penalty(jnp.float32(1), jnp.float32(0)), alpha)
    c2 = mp.total_cost(cfg, basis, scn, mp.Penalty(jnp.float32(2), jnp.float32(0)), alpha)
    np.testing.assert_allclose(float(c2 - c1), float(c1 - c0), rtol=1e-4)
