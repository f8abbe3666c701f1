"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8) — the clusterless pattern for
validating mesh partitioning and collectives (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.parallel import mesh as meshlib
from irm_motion_planning_tpu.parallel import sharded
from irm_motion_planning_tpu.solvers import batched


@pytest.fixture(scope="module")
def cfg():
    return mp.PlannerConfig(
        fixed_iters=True, max_inner_iteration=10, max_outer_iteration=2
    )


@pytest.fixture(scope="module")
def eight_mesh(cpu_devices):
    assert len(cpu_devices) >= 8, "conftest must provide 8 virtual devices"
    return meshlib.make_mesh(cpu_devices[:8])


def _lane_costs(cfg, basis, scns, alphas, n):
    pen = mp.initial_penalty(cfg)
    out = []
    for i in range(n):
        scn_i = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], scns)
        out.append(float(mp.total_cost(cfg, basis, mp.Scenario(*scn_i), pen,
                                       jnp.asarray(np.asarray(alphas)[i]))))
    return np.asarray(out)


def test_sharded_solver_matches_unsharded(cfg, eight_mesh):
    """Sharded execution must reach the same per-lane solution quality (the
    per-device shard shape differs from the full batch shape, so bitwise
    equality is not the contract — see test_batched.py docstring)."""
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(0), 16)
    ref = batched.make_batched_solver(cfg, basis)(scns)
    scns_sharded = meshlib.shard_batch(eight_mesh, scns)
    run = sharded.make_sharded_solver(cfg, basis, eight_mesh)
    res = run(scns_sharded)
    # result really is sharded over the mesh
    assert len(res.alpha.sharding.device_set) == 8
    c_ref = _lane_costs(cfg, basis, scns, ref.alpha, 16)
    c_shd = _lane_costs(cfg, basis, scns, res.alpha, 16)
    np.testing.assert_allclose(c_shd, c_ref, rtol=7e-2)


def test_shard_map_solver_and_collective_stats(cfg, eight_mesh):
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(1), 16)
    ref = batched.make_batched_solver(cfg, basis)(scns)
    ref_stats = batched.batch_summary(ref)

    run = sharded.make_shard_map_solver(cfg, basis, eight_mesh)
    res, stats = run(meshlib.shard_batch(eight_mesh, scns))
    c_ref = _lane_costs(cfg, basis, scns, ref.alpha, 16)
    c_shd = _lane_costs(cfg, basis, scns, res.alpha, 16)
    np.testing.assert_allclose(c_shd, c_ref, rtol=7e-2)
    # psum-reduced global stats equal the single-device reduction (quality)
    assert int(stats["n_total"]) == 16
    np.testing.assert_allclose(
        float(stats["mean_final_cost"]),
        float(ref_stats["mean_final_cost"]),
        rtol=2e-2,
    )
    # the shard_map program's own reduction must be self-consistent
    local = float(jnp.mean(jnp.asarray(res.stats.final_cost)))
    np.testing.assert_allclose(float(stats["mean_final_cost"]), local, rtol=1e-5)


def test_uneven_padding_helper():
    assert meshlib.pad_to_multiple(17, 8) == 24
    assert meshlib.pad_to_multiple(16, 8) == 16
