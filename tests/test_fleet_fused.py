"""VMEM-resident whole-solve kernel (backend='fused') vs the per-step pallas
backend and the XLA fleet backend (interpret mode on CPU, tiny budgets — the
compiled TPU path is exercised by bench runs)."""

import jax
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import fleet


@pytest.fixture(scope="module")
def setup():
    cfg = mp.PlannerConfig(max_inner_iteration=6, max_outer_iteration=2,
                           fixed_iters=True)
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(9), 128)
    return cfg, basis, scns


def test_fused_matches_per_step_pallas(setup):
    """Same math in the same order: the whole-solve kernel must reproduce
    the per-step kernel ladder essentially exactly."""
    cfg, basis, scns = setup
    r_s = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, backend="fused", interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.converged), np.asarray(r_s.stats.converged)
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.inner_iters), np.asarray(r_s.stats.inner_iters)
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.outer_iters), np.asarray(r_s.stats.outer_iters)
    )


def test_fused_matches_per_step_pallas_early_exit(setup):
    """Early-exit protocol (while-loop semantics in the per-step path vs
    fori+cond in the fused kernel) must agree too."""
    cfg, basis, scns = setup
    cfg = cfg.replace(fixed_iters=False)
    r_s = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, backend="fused", interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.inner_iters), np.asarray(r_s.stats.inner_iters)
    )


def test_fused_gd_matches_per_step(setup):
    cfg, basis, scns = setup
    r_s = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="pallas",
                            interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="fused",
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.converged), np.asarray(r_s.stats.converged)
    )


def test_fused_quality_vs_xla(setup):
    cfg, basis, scns = setup
    r_x = fleet.fleet_solve(cfg, basis, scns, backend="xla")
    r_f = fleet.fleet_solve(cfg, basis, scns, backend="fused", interpret=True)
    pen = mp.initial_penalty(cfg)
    gaps = []
    for i in range(0, 128, 16):
        scn_i = jax.tree_util.tree_map(lambda x: x[i], scns)
        cx = float(mp.total_cost(cfg, basis, scn_i, pen, r_x.alpha[i]))
        cf = float(mp.total_cost(cfg, basis, scn_i, pen, r_f.alpha[i]))
        gaps.append(abs(cx - cf) / max(abs(cx), 1e-6))
    assert np.median(gaps) < 5e-2, gaps


def test_inner_schedule_parity_across_backends(setup):
    """A per-round inner schedule (traced fori bound in the kernels) must
    behave identically in all three fleet backends: the two kernel paths
    match essentially exactly, and the step accounting matches the XLA
    backend lane for lane (fp paths agree at these tiny budgets)."""
    cfg, basis, scns = setup
    cfg = cfg.replace(inner_schedule=(5, 3), max_inner_iteration=6)
    r_x = fleet.fleet_solve(cfg, basis, scns, backend="xla")
    r_s = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, backend="fused", interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.inner_iters), np.asarray(r_s.stats.inner_iters)
    )
    # Budget bound: no lane can exceed the schedule sum (5 + 3), and at
    # least one lane must be cut by the round-0 budget of 5 (uniform-6
    # running would allow up to 12).
    assert int(np.asarray(r_x.stats.inner_iters).max()) <= 8
    assert int(np.asarray(r_f.stats.inner_iters).max()) <= 8


def test_inner_schedule_gd_parity(setup):
    cfg, basis, scns = setup
    cfg = cfg.replace(inner_schedule=(5, 3), max_inner_iteration=6)
    r_s = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="pallas",
                            interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, solver="gd", backend="fused",
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.inner_iters), np.asarray(r_s.stats.inner_iters)
    )


def test_exact_ladder_parity_across_kernels(setup):
    """ladder_eval='exact' (per-rung forward GEMMs instead of the linearized
    affine combination) must agree between the two kernel paths."""
    cfg, basis, scns = setup
    cfg = cfg.replace(ladder_eval="exact")
    r_s = fleet.fleet_solve(cfg, basis, scns, backend="pallas", interpret=True)
    r_f = fleet.fleet_solve(cfg, basis, scns, backend="fused", interpret=True)
    np.testing.assert_allclose(
        np.asarray(r_f.alpha), np.asarray(r_s.alpha), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r_f.stats.inner_iters), np.asarray(r_s.stats.inner_iters)
    )


def test_inner_schedule_ignored_when_early_exit(setup):
    """config contract: inner_schedule only applies with fixed_iters=True.
    In early-exit mode every backend must produce the same result with and
    without a schedule set (round 1 of this bug: the fused kernel applied
    the schedule unconditionally, silently truncating rounds)."""
    cfg, basis, scns = setup
    cfg = cfg.replace(fixed_iters=False)
    cfg_s = cfg.replace(inner_schedule=(1, 1), max_inner_iteration=6)
    for backend in ("xla", "fused"):
        r_plain = fleet.fleet_solve(cfg, basis, scns, backend=backend,
                                    interpret=backend != "xla")
        r_sched = fleet.fleet_solve(cfg_s, basis, scns, backend=backend,
                                    interpret=backend != "xla")
        np.testing.assert_array_equal(
            np.asarray(r_plain.alpha), np.asarray(r_sched.alpha)
        ), backend
