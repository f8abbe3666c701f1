"""Pallas-backend fleet solver vs the XLA fleet backend (interpret mode on
CPU, tiny budgets — the compiled TPU path is exercised by bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import fleet


@pytest.fixture(scope="module")
def setup():
    # recip_newton=True: per-lane comparisons against the XLA backend's
    # exact divides need the refined reciprocal — the raw approximation's
    # ~2.4e-4 error is commensurate with the 1e-3 stop threshold, so step
    # counters flip lane-by-lane.  The raw-approximation default is gated
    # distributionally (benchmarks/quality.py on TPU).
    cfg = mp.PlannerConfig(max_inner_iteration=6, max_outer_iteration=2,
                           fixed_iters=True, recip_newton=True)
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(9), 128)
    return cfg, basis, scns


def test_pallas_backend_matches_xla_quality(setup):
    cfg, basis, scns = setup
    r_x = fleet.fleet_solve(cfg, basis, scns, backend="xla")
    r_p = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    pen = mp.initial_penalty(cfg)
    gaps = []
    for i in range(0, 128, 16):
        scn_i = jax.tree_util.tree_map(lambda x: x[i], scns)
        cx = float(mp.total_cost(cfg, basis, scn_i, pen, r_x.alpha[i]))
        cp = float(mp.total_cost(cfg, basis, scn_i, pen, r_p.alpha[i]))
        gaps.append(abs(cx - cp) / max(abs(cx), 1e-6))
    assert np.median(gaps) < 5e-2, gaps
    # Iteration counters agree on the majority of lanes.  The kernel's
    # linearized next-iterate evaluation changes the fp path of the stop
    # test, whose 1e-3 threshold sits below cross-engine f32 noise (see
    # CLAUDE.md invariants), so near-threshold lanes flip by a step or two;
    # converged flags still agree 100% and the cost-gap median is ~4e-4.
    same = np.asarray(r_x.stats.inner_iters) == np.asarray(r_p.stats.inner_iters)
    assert same.mean() > 0.5


def test_pallas_backend_reference_scene(setup):
    cfg, basis, _ = setup
    scns = mp.replicate_scenario(mp.reference_scenario(cfg), 128)
    res = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    # identical lanes stay identical through the kernel path
    np.testing.assert_array_equal(
        np.asarray(res.alpha[0]), np.asarray(res.alpha[64])
    )
    scn = mp.reference_scenario(cfg)
    pen = mp.initial_penalty(cfg)
    c0 = float(mp.total_cost(cfg, basis, scn, pen,
                             fleet.fleet_solve(cfg, basis, scns,
                                               backend="xla").alpha[0]))
    cp = float(mp.total_cost(cfg, basis, scn, pen, res.alpha[0]))
    assert abs(c0 - cp) / abs(c0) < 5e-2


def test_pallas_backend_gd(setup):
    cfg, basis, scns = setup
    r_x = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="xla")
    r_p = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="pallas",
                            interpret=True)
    pen = mp.initial_penalty(cfg)
    gaps = []
    for i in range(0, 128, 32):
        scn_i = jax.tree_util.tree_map(lambda x: x[i], scns)
        cx = float(mp.total_cost(cfg, basis, scn_i, pen, r_x.alpha[i]))
        cp = float(mp.total_cost(cfg, basis, scn_i, pen, r_p.alpha[i]))
        gaps.append(abs(cx - cp) / max(abs(cx), 1e-6))
    assert np.median(gaps) < 5e-2, gaps
