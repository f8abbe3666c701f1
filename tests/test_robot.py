"""Unit tests for the planar-arm model (models/robot.py): FK vs trig
reference, analytical Jacobian vs autodiff and finite differences,
constraint predicates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.models import robot


@pytest.fixture(scope="module")
def cfg():
    return mp.PlannerConfig()


def _random_configs(cfg, n=7, seed=0):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n, cfg.n_joints), minval=-1.0, maxval=2.0
    )


def test_fk_matches_manual_trig(cfg):
    q = _random_configs(cfg)
    pos = robot.fk(cfg, q)  # (2, T)
    L = np.asarray(cfg.link_length)
    qn = np.asarray(q)
    for t in range(qn.shape[0]):
        ang = np.cumsum(qn[t])
        x = float(np.sum(L * np.cos(ang)))
        y = float(np.sum(L * np.sin(ang)))
        np.testing.assert_allclose(np.asarray(pos[:, t]), [x, y], rtol=1e-5, atol=1e-5)


def test_fk_zero_config_is_stretched_arm(cfg):
    q = jnp.zeros((1, cfg.n_joints))
    pos = robot.fk(cfg, q)
    np.testing.assert_allclose(
        np.asarray(pos[:, 0]), [sum(cfg.link_length), 0.0], atol=1e-6
    )


def test_fk_joint_chain(cfg):
    """fk_joint(k) must equal the partial-arm FK; the last one equals fk."""
    q = _random_configs(cfg)
    full = robot.fk(cfg, q)
    last = robot.fk_joint(cfg, q, cfg.n_joints)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full), atol=1e-6)
    allj = robot.fk_all_joints(cfg, q)  # (J, 2, T)
    for k in range(1, cfg.n_joints + 1):
        np.testing.assert_allclose(
            np.asarray(allj[k - 1]),
            np.asarray(robot.fk_joint(cfg, q, k)),
            atol=1e-5,
        )


def test_jacobian_vs_autodiff(cfg):
    """The analytical reverse-cumsum Jacobian (ref: robot.py:75-87) must match
    jax.jacobian of the FK."""
    q = _random_configs(cfg, n=5)
    jac = robot.jacobian(cfg, q)  # (2, T, J)

    def ee_of_single(qt):
        return robot.fk(cfg, qt[None, :])[:, 0]  # (2,)

    for t in range(5):
        jt = jax.jacobian(ee_of_single)(q[t])  # (2, J)
        np.testing.assert_allclose(
            np.asarray(jac[:, t, :]), np.asarray(jt), rtol=1e-4, atol=1e-5
        )


def test_jacobian_vs_finite_differences(cfg):
    q = _random_configs(cfg, n=3, seed=3)
    jac = np.asarray(robot.jacobian(cfg, q))
    eps = 1e-3
    for t in range(3):
        for j in range(cfg.n_joints):
            qp = q.at[t, j].add(eps)
            qm = q.at[t, j].add(-eps)
            fd = (robot.fk(cfg, qp)[:, t] - robot.fk(cfg, qm)[:, t]) / (2 * eps)
            np.testing.assert_allclose(jac[:, t, j], np.asarray(fd), atol=5e-3)


def test_generalized_joint_count_fk():
    cfg5 = mp.PlannerConfig(
        n_joints=5, link_length=(1.0, 0.8, 0.6, 0.4, 0.2)
    )
    q = jnp.zeros((4, 5))
    pos = robot.fk(cfg5, q)
    np.testing.assert_allclose(np.asarray(pos[0]), 3.0, atol=1e-6)
    jac = robot.jacobian(cfg5, q)
    assert jac.shape == (2, 4, 5)


def test_constraint_predicates(cfg):
    ok = robot.start_goal_position_ok(
        cfg, jnp.zeros(3), jnp.ones(3), jnp.zeros(3), jnp.ones(3)
    )
    assert bool(ok)
    bad = robot.start_goal_position_ok(
        cfg, jnp.zeros(3), jnp.ones(3), jnp.zeros(3) + 0.02, jnp.ones(3)
    )
    assert not bool(bad)
    assert bool(robot.joint_position_ok(cfg, jnp.asarray([[0.0, 1.9, -0.9]])))
    assert not bool(robot.joint_position_ok(cfg, jnp.asarray([[0.0, 2.1, 0.0]])))
    assert bool(robot.joint_velocity_ok(cfg, jnp.asarray([[6.9, -6.9, 0.0]])))
    assert not bool(robot.joint_velocity_ok(cfg, jnp.asarray([[7.1, 0.0, 0.0]])))


def test_config_validation():
    with pytest.raises(ValueError):
        mp.PlannerConfig(n_joints=4)  # link_length has 3 entries
    with pytest.raises(ValueError):
        mp.PlannerConfig(max_outer_iteration=11)  # gd_lr has 10 entries
