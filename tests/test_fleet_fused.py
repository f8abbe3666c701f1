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


def test_ladder_unroll_bitwise_neutral(setup):
    """cfg.bls_ladder_unroll moves the first k Armijo rungs out of the
    while-loop; the rung op sequence is shared (pallas_step rung_eval), so
    results must be BITWISE identical for any k (including k = all rungs:
    the loop disappears entirely)."""
    cfg, basis, scns = setup
    base = fleet.fleet_solve(cfg.replace(bls_ladder_unroll=0), basis, scns,
                             backend="fused", interpret=True)
    for k in (2, 3, cfg.max_bls_iteration):
        r = fleet.fleet_solve(cfg.replace(bls_ladder_unroll=k), basis, scns,
                              backend="fused", interpret=True)
        _assert_solve_equal(r, base)


def test_converged_flags_certified_by_exact_evaluation(setup):
    """VERDICT r3 #1: a kernel-engine 'converged' flag must mean the
    reference's thing — the hard constraints hold on the EXACTLY-evaluated
    final trajectory (ref: trajectory.py:129-137), not on the linearized
    carry accumulated over a round's inner steps.  Zero phantom
    convergences, per backend, on random scenes."""
    cfg, basis, scns = setup
    # Realistic budgets so lanes actually converge (the module fixture's
    # 6x2 leaves ~0 converged lanes — nothing to certify).
    cfg = cfg.replace(max_inner_iteration=25, max_outer_iteration=4)
    fs = fleet.to_fleet(scns)
    for backend in ("fused", "pallas"):
        res = fleet.fleet_solve(cfg, basis, scns, backend=backend,
                                interpret=True)
        ok_exact = fleet.fleet_constraints(
            cfg, basis, fs, fleet.alpha_to_fleet(res.alpha)
        )
        conv = np.asarray(res.stats.converged)
        phantom = conv & ~np.asarray(ok_exact)
        assert conv.any(), "budget too small: no converged lanes to certify"
        assert not phantom.any(), (
            f"{backend}: {phantom.sum()} phantom convergences"
        )


def _kernel_args(cfg, basis, scns):
    import jax.numpy as jnp

    fs = fleet.to_fleet(scns)
    a0 = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)
    B = a0.shape[-1]
    return (
        cfg, basis.kv, basis.kv.T, basis.mix, a0,
        jnp.full((1, B), cfg.lambda_sg_constraint, jnp.float32),
        jnp.full((1, B), cfg.lambda_jl_constraint, jnp.float32),
        fs.start, fs.goal,
        fs.obstacles[:, 0, :], fs.obstacles[:, 1, :], fs.obstacle_weight,
    )


@pytest.mark.parametrize("solver", ["bls", "gd"])
def test_streamed_basis_bitwise_matches_resident(setup, solver):
    """Tiled-T mode (basis streamed from HBM in row blocks, SURVEY §5.7):
    output rows of the blocked contraction are the same full-length dot
    products as the resident single dot, so the whole solve must be
    BITWISE identical to the resident kernel."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg, basis, scns = setup
    scns16 = jax.tree_util.tree_map(lambda x: x[:16], scns)
    args = _kernel_args(cfg, basis, scns16)
    r0 = ps.fused_solve(*args, solver=solver, block_b=16, stream_rb=0,
                        interpret=True)
    # rb=10 divides T=50; rb=16 does NOT (exercises the remainder block)
    for rb in (10, 16):
        r1 = ps.fused_solve(*args, solver=solver, block_b=16, stream_rb=rb,
                            interpret=True)
        np.testing.assert_array_equal(
            np.asarray(r0.alpha), np.asarray(r1.alpha)
        )
        np.testing.assert_array_equal(
            np.asarray(r0.final_loss), np.asarray(r1.final_loss)
        )
        np.testing.assert_array_equal(
            np.asarray(r0.inner_iters), np.asarray(r1.inner_iters)
        )


def test_streamed_eval_kernel_bitwise(setup):
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg, basis, scns = setup
    (cfg, kv, kvt, mix, a0, lsg, ljl, start, goal, ox, oy, ow) = _kernel_args(
        cfg, basis, jax.tree_util.tree_map(lambda x: x[:16], scns)
    )
    e0 = ps.cost_grad_eval(cfg, kv, kvt, mix, a0, lsg, ljl, start, goal,
                           ox, oy, ow, block_b=16, stream_rb=0, interpret=True)
    e1 = ps.cost_grad_eval(cfg, kv, kvt, mix, a0, lsg, ljl, start, goal,
                           ox, oy, ow, block_b=16, stream_rb=25, interpret=True)
    for f0, f1 in zip(e0, e1):
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_kernel_plan_selection():
    """Resident preferred when it fits; streaming takes over at large T
    (where round 2 fell back to XLA); None only past the streamed ceiling."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    auto = mp.PlannerConfig(pallas_block_b=0)
    assert ps.choose_kernel_plan(auto, 50, 4096) == ps.KernelPlan(512, 0)
    # Heterogeneous (compaction) mode prefers the finest tile.
    het = mp.PlannerConfig(pallas_block_b=0, lane_compaction=True)
    assert ps.choose_kernel_plan(het, 50, 4096) == ps.KernelPlan(128, 0)
    assert ps.choose_kernel_plan(auto, 500, 4096) == ps.KernelPlan(128, 0)
    # T=800 was round 2's XLA-fallback wall; now streamed.
    p800 = ps.choose_kernel_plan(auto, 800, 4096)
    assert p800 is not None and p800.stream_rb > 0
    p1000 = ps.choose_kernel_plan(auto, 1000, 4096)
    assert p1000 is not None and p1000.stream_rb > 0
    assert 1000 % p1000.stream_rb == 0 and p1000.stream_rb % 8 == 0
    # T=1200: the carrying form's real streamed usage OOMed on-chip (round
    # 3: 96.25 MB allocated) — the LEAN tier (FK carry dropped, smaller
    # live state) takes over instead of falling back to XLA.
    p1200 = ps.choose_kernel_plan(auto, 1200, 4096)
    assert p1200 is not None and p1200.stream_rb > 0 and p1200.lean
    # T=1600-1800: past the lean ceiling the ULTRA tier takes over (the
    # (traj, vel) carry dropped too; BLS recomputes the exact forward at
    # each step start) instead of falling back to XLA.
    p1600 = ps.choose_kernel_plan(auto, 1600, 4096)
    assert p1600 is not None and p1600.stream_rb > 0 and p1600.ultra
    p1800 = ps.choose_kernel_plan(auto, 1800, 4096)
    assert p1800 is not None and p1800.ultra
    # Far past even the ultra per-lane-state ceiling: infeasible.
    assert ps.choose_kernel_plan(auto, 4096, 4096) is None
    # The tight rb=64 pass admits exactly the chip-validated BLS frontier:
    # T=2000 plans rb=64 (measured: compiles and runs, 981 us/solve) and
    # T=1800 stays on the validated rb=64 (rb=200 there OOMed at
    # 118.13 MiB; rb=128 interpolates past the cap too — the 1.9 ratio is
    # the rung that excludes both).
    assert p1800.stream_rb == 64
    p2000 = ps.choose_kernel_plan(auto, 2000, 4096, solver="bls")
    assert p2000 is not None and p2000.ultra and p2000.stream_rb == 64
    # bf16 ladder tier is OPT-IN (converged-fraction trade, config.py):
    # default routes T=2200 to the XLA fallback; with the flag the
    # chip-validated bf16 plan engages.
    assert ps.choose_kernel_plan(auto, 2200, 4096, solver="bls") is None
    pb = ps.choose_kernel_plan(
        auto.replace(bls_bf16_ladder=True), 2200, 4096, solver="bls")
    assert pb is not None and pb.bf16
    # Solver-aware ultra: GD's ladder-free stack measures ~366 B/(t, lane)
    # real vs BLS's (PROBLEMSIZE_r04.json), so GD reaches further still;
    # past its measured frontier the chooser must return None.
    p2200 = ps.choose_kernel_plan(auto, 2200, 4096, solver="gd")
    assert p2200 is not None and p2200.ultra
    p2400 = ps.choose_kernel_plan(auto, 2400, 4096, solver="gd")
    assert p2400 is not None and p2400.stream_rb == 64  # measured: 148 us
    assert ps.choose_kernel_plan(auto, 2600, 4096, solver="gd") is None


def test_lean_mode_matches_carry(setup):
    """lean=True (no FK carry) recomputes what the carry reuses — same real
    arithmetic, ~1-2 ulp fp path (the class documented in _bls_step), so
    results agree to tolerance and step accounting matches exactly at tiny
    budgets."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg, basis, scns = setup
    args = _kernel_args(cfg, basis, jax.tree_util.tree_map(
        lambda x: x[:16], scns))
    r0 = ps.fused_solve(*args, solver="bls", block_b=16, interpret=True)
    r1 = ps.fused_solve(*args, solver="bls", block_b=16, interpret=True,
                        lean=True)
    # ~1-2 ulp per reuse compounds over the round's steps: measured 0.2% of
    # elements off by <=1.3e-4 relative at this budget — the same fp-path
    # class as recip/strength-reduction (below the 5e-3 cross-engine floor).
    np.testing.assert_allclose(
        np.asarray(r0.alpha), np.asarray(r1.alpha), rtol=1e-3, atol=1e-3
    )
    # Step counts are fp-path-dependent (1e-3 plateau stop below f32
    # noise, CLAUDE.md): most lanes agree exactly, stragglers may stop a
    # few steps apart.
    same = np.asarray(r0.inner_iters) == np.asarray(r1.inner_iters)
    assert same.mean() >= 0.75, same


def test_ultra_mode(setup):
    """ultra=True additionally drops the carried (traj, vel) planes.  GD
    never reads the carry for compute (its trial evaluates from alpha), so
    GD ultra must be BITWISE identical.  BLS recomputes the EXACT forward
    at each step start instead of the linearized carry — a real fp-path
    change (drift resets every step), so outcomes are compared as a
    quality distribution, not per-lane (CLAUDE.md numerics invariants)."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg, basis, scns = setup
    args = _kernel_args(cfg, basis, jax.tree_util.tree_map(
        lambda x: x[:16], scns))
    for solver in ("bls", "gd"):
        r0 = ps.fused_solve(*args, solver=solver, block_b=16, interpret=True)
        r1 = ps.fused_solve(*args, solver=solver, block_b=16, interpret=True,
                            lean=True, ultra=True)
        if solver == "gd":
            np.testing.assert_array_equal(
                np.asarray(r0.alpha), np.asarray(r1.alpha)
            )
            np.testing.assert_array_equal(
                np.asarray(r0.inner_iters), np.asarray(r1.inner_iters)
            )
        else:
            # measured at this budget: max |dalpha| 0.015, all converged
            # flags equal; stop steps are fp-path-dependent at the 1e-3
            # plateau threshold
            np.testing.assert_allclose(
                np.asarray(r0.alpha), np.asarray(r1.alpha),
                rtol=0.05, atol=0.05,
            )
        if solver == "gd":
            np.testing.assert_array_equal(
                np.asarray(r0.fulfilled), np.asarray(r1.fulfilled)
            )
        else:
            # BLS ultra is fp-path-dependent at the sharp eps thresholds
            # (documented non-regression) — allow a <=1-lane wobble like
            # QUALITY_SWEEP_r04 rather than asserting bitwise flags.
            diff = int(np.sum(np.asarray(r0.fulfilled)
                              != np.asarray(r1.fulfilled)))
            assert diff <= 1, f"{diff} BLS ultra fulfilled flags differ"


def test_bf16_ladder_tier(setup):
    """The bf16 ladder tier (ops/pallas_step.py::_bls_step bf16=True: the
    in-step (traj, vel, dir) ladder planes stored half-width, Armijo/stop
    baseline re-evaluated through the same quantized path) must produce
    finite, close solutions with comparable convergence.  Direction
    quantization is a chaos-class fp-path change, so the comparison is
    loose/distributional, not bitwise (CLAUDE.md numerics invariants).
    The tier only auto-engages past the f32 ultra wall (BLS T>2000,
    choose_kernel_plan) where the alternative is the XLA fallback."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg, basis, scns = setup
    args = _kernel_args(cfg, basis, jax.tree_util.tree_map(
        lambda x: x[:16], scns))
    r0 = ps.fused_solve(*args, solver="bls", block_b=16, interpret=True,
                        lean=True, ultra=True)
    r1 = ps.fused_solve(*args, solver="bls", block_b=16, interpret=True,
                        lean=True, ultra=True, bf16=True)
    a0_, a1_ = np.asarray(r0.alpha), np.asarray(r1.alpha)
    assert np.isfinite(a1_).all()
    # measured at this budget: max rel alpha diff 1.9%
    np.testing.assert_allclose(a1_, a0_, rtol=0.05, atol=0.05)
    f0 = float(np.asarray(r0.fulfilled).sum())
    f1 = float(np.asarray(r1.fulfilled).sum())
    assert abs(f0 - f1) <= 2, (f0, f1)


def test_bf16_plan_only_past_f32_wall():
    """choose_kernel_plan: the bf16 tier engages ONLY where every f32 plan
    is infeasible (BLS T>2000 at the calibrated constants) and never for
    GD (which reaches T=2400 in f32)."""
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg = mp.PlannerConfig(pallas_block_b=0, bls_bf16_ladder=True)
    at2000 = ps.choose_kernel_plan(cfg.replace(n_timesteps=2000), 2000, 512)
    assert at2000 is not None and not at2000.bf16
    at2200 = ps.choose_kernel_plan(cfg.replace(n_timesteps=2200), 2200, 512)
    assert at2200 is not None and at2200.bf16 and at2200.ultra
    # Chip-calibrated admission (_BF16_REAL_OVER_EST 2.04, cap 120 MiB):
    # T=2200 is the bf16 frontier; T=2400's predicted real usage ~131 MiB
    # exceeds even the physical ceiling — XLA fallback.
    assert ps.choose_kernel_plan(
        cfg.replace(n_timesteps=2400), 2400, 512) is None
    gd2400 = ps.choose_kernel_plan(
        cfg.replace(n_timesteps=2400), 2400, 512, solver="gd")
    assert gd2400 is not None and not gd2400.bf16


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


def _assert_solve_equal(r_a, r_b):
    np.testing.assert_array_equal(np.asarray(r_a.alpha), np.asarray(r_b.alpha))
    np.testing.assert_array_equal(
        np.asarray(r_a.stats.converged), np.asarray(r_b.stats.converged)
    )
    np.testing.assert_array_equal(
        np.asarray(r_a.stats.inner_iters), np.asarray(r_b.stats.inner_iters)
    )
    np.testing.assert_array_equal(
        np.asarray(r_a.stats.outer_iters), np.asarray(r_b.stats.outer_iters)
    )
    np.testing.assert_array_equal(
        np.asarray(r_a.stats.final_cost), np.asarray(r_b.stats.final_cost)
    )


@pytest.mark.parametrize("solver", ["bls", "gd"])
def test_fused_rounds_driver_matches_fused_bitwise(setup, solver):
    """The per-round kernel driver (fused_round x max_outer launches, dual
    bookkeeping in XLA) must reproduce the whole-solve kernel BITWISE: the
    round body is the same traced op sequence (pallas_step.run_inner) and
    the XLA-side penalty updates are op-for-op the in-kernel epilogue."""
    import jax.numpy as jnp

    cfg, basis, scns = setup
    r_f = fleet.fleet_solve(cfg, basis, scns, solver=solver, backend="fused",
                            interpret=True)
    fs = fleet.to_fleet(scns)
    a0k = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)
    r_r = fleet._pallas_fused_rounds_solve(
        cfg, basis, fs, a0k, 128, solver=solver, interpret=True,
        compact=False,
    )
    _assert_solve_equal(r_r, r_f)


@pytest.mark.parametrize("solver", ["bls", "gd"])
def test_lane_compaction_bitwise_invariant(setup, solver):
    """cfg.lane_compaction re-sorts lanes between rounds; per-lane results
    must be BITWISE identical to the whole-solve kernel (all lane ops are
    elementwise, freeze/skip are identity pass-throughs — only tile
    grouping, i.e. throughput, may change)."""
    cfg, basis, scns = setup
    r_f = fleet.fleet_solve(cfg, basis, scns, solver=solver, backend="fused",
                            interpret=True)
    r_c = fleet.fleet_solve(cfg.replace(lane_compaction=True), basis, scns,
                            solver=solver, backend="fused", interpret=True)
    _assert_solve_equal(r_c, r_f)


def test_lane_compaction_early_exit_and_schedule(setup):
    """Compaction under both inner-loop protocols: the early-exit while
    semantics (n_r = max_inner_iteration + in-kernel tile early-out) and the
    fixed per-round schedule."""
    cfg, basis, scns = setup
    for variant in (
        cfg.replace(fixed_iters=False),
        cfg.replace(inner_schedule=(4, 6)),
    ):
        r_f = fleet.fleet_solve(variant, basis, scns, backend="fused",
                                interpret=True)
        r_c = fleet.fleet_solve(variant.replace(lane_compaction=True), basis,
                                scns, backend="fused", interpret=True)
        _assert_solve_equal(r_c, r_f)


def test_lane_compaction_streamed_basis(setup):
    """Compaction composes with tiled-T streamed-basis mode (SMEM scalar +
    ANY-space basis refs in one kernel)."""
    import jax.numpy as jnp

    cfg, basis, scns = setup
    fs = fleet.to_fleet(scns)
    a0k = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)
    r_res = fleet._pallas_fused_rounds_solve(
        cfg, basis, fs, a0k, 128, interpret=True, compact=True)
    r_str = fleet._pallas_fused_rounds_solve(
        cfg, basis, fs, a0k, 128, stream_rb=25, interpret=True, compact=True)
    _assert_solve_equal(r_str, r_res)


def test_lane_compaction_rejected_on_non_fused_backends(setup):
    """cfg.lane_compaction is a fused-kernel driver feature; requesting it
    with another backend must fail loudly, not be silently ignored."""
    cfg, basis, scns = setup
    cfg = cfg.replace(lane_compaction=True)
    for backend in ("xla", "pallas"):
        with pytest.raises(ValueError, match="lane_compaction"):
            fleet.fleet_solve(cfg, basis, scns, backend=backend,
                              interpret=backend != "xla")


def test_lane_compaction_crosses_tiles(setup):
    """256 lanes at block_b=128 (2 tiles): the between-round re-sort moves
    lanes ACROSS tile boundaries (the single-tile cases above only permute
    within one tile) — results must still be bitwise invariant."""
    cfg, basis, _ = setup
    cfg2 = cfg.replace(pallas_block_b=128)
    scns = mp.random_scenarios(cfg2, jax.random.PRNGKey(3), 256)
    r_f = fleet.fleet_solve(cfg2, basis, scns, backend="fused",
                            interpret=True)
    r_c = fleet.fleet_solve(cfg2.replace(lane_compaction=True), basis, scns,
                            backend="fused", interpret=True)
    _assert_solve_equal(r_c, r_f)
