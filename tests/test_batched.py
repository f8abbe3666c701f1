"""Batched-engine tests.

Contract: within one compiled batch shape, identical lanes produce identical
results (deterministic SPMD).  Across DIFFERENT shapes (batched vs single,
sharded vs unsharded) XLA's batched GEMM rounding flips marginal line-search
decisions of this chaotic optimization, so cross-shape checks compare
solution QUALITY (final cost, constraint outcomes), not bits — the same
contract the ladder/sequential pair obeys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import batched, bls


@pytest.fixture(scope="module")
def cfg():
    # Small horizons keep the lockstep batch tests fast.
    return mp.PlannerConfig(max_inner_iteration=30, max_outer_iteration=3)


def _final_cost(cfg, basis, scn, alpha):
    pen = mp.initial_penalty(cfg)
    return float(mp.total_cost(cfg, basis, scn, pen, alpha))


def test_identical_lanes_are_bitwise_identical(cfg):
    """Determinism: replicated scenarios must produce identical lanes."""
    basis = mp.make_basis(cfg)
    scn = mp.reference_scenario(cfg)
    batch = mp.replicate_scenario(scn, 4)
    res = batched.make_batched_solver(cfg, basis)(batch)
    for i in range(1, 4):
        np.testing.assert_array_equal(
            np.asarray(res.alpha[0]), np.asarray(res.alpha[i])
        )
        assert int(res.stats.inner_iters[0]) == int(res.stats.inner_iters[i])


def test_batched_matches_single_quality(cfg):
    """Each batched lane must reach the single-solve solution quality."""
    basis = mp.make_basis(cfg)
    key = jax.random.PRNGKey(1)
    scns = mp.random_scenarios(cfg, key, 4)
    res = batched.make_batched_solver(cfg, basis)(scns)
    for i in range(4):
        scn_i = jax.tree_util.tree_map(lambda x: x[i], scns)
        single = jax.jit(lambda s: bls.solve(cfg, basis, s))(scn_i)
        c_b = _final_cost(cfg, basis, scn_i, res.alpha[i])
        c_s = _final_cost(cfg, basis, scn_i, single.alpha)
        # Truncated horizons leave these random scenes mid-descent, where
        # path sensitivity is largest; gaps land on both sides of zero.
        assert abs(c_b - c_s) / max(abs(c_s), 1e-6) < 7e-2, (i, c_b, c_s)


def test_frozen_lanes_do_not_drift(cfg):
    """A lane that converges early must be frozen while other lanes keep
    iterating: mix an easy (obstacle-free) scenario with the hard reference
    scene and check the easy lane equals its solo batch solve."""
    basis = mp.make_basis(cfg)
    easy = mp.make_scenario(cfg, [0.0, 0.0, 0.0], [0.4, 0.2, 0.1], np.zeros((0, 2)))
    hard = mp.reference_scenario(cfg)
    both = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), easy, hard
    )
    run = batched.make_batched_solver(cfg, basis)
    res_pair = run(both)
    easy_pair = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), easy)
    res_easy = run(easy_pair)
    # same batch shape => same rounding => the easy lane must match exactly
    np.testing.assert_array_equal(
        np.asarray(res_pair.alpha[0]), np.asarray(res_easy.alpha[0])
    )
    assert bool(res_pair.stats.converged[0])


def test_batch_summary(cfg):
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(2), 8)
    res = batched.make_batched_solver(cfg, basis)(scns)
    s = batched.batch_summary(res)
    assert s["n"] == 8
    assert 0.0 <= float(s["converged_fraction"]) <= 1.0
    assert np.isfinite(float(s["mean_final_cost"]))


def test_gd_batched(cfg):
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(3), 4)
    res = batched.make_batched_solver(cfg, basis, solver="gd")(scns)
    assert res.alpha.shape[0] == 4
    assert np.isfinite(np.asarray(res.stats.final_cost)).all()


def test_fixed_iters_batch_equals_early_exit_batch(cfg):
    """Same batch shape, fixed-horizon vs early-exit: identical results."""
    cfg_f = cfg.replace(fixed_iters=True)
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(4), 4)
    r_w = batched.make_batched_solver(cfg, basis)(scns)
    r_f = batched.make_batched_solver(cfg_f, basis)(scns)
    np.testing.assert_allclose(
        np.asarray(r_w.alpha), np.asarray(r_f.alpha), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_w.stats.inner_iters), np.asarray(r_f.stats.inner_iters)
    )
