"""Typed configuration for the TPU-native RKHS trajectory-optimization engine.

Design: the reference (ref: main.py:13-102) plumbs ~30 argparse flags as
Python attributes that get closed over inside jitted functions.  We make the
static/dynamic split explicit instead:

* ``PlannerConfig`` — a frozen, hashable dataclass.  Every field is a
  *compile-time* constant: shapes (``n_timesteps``, ``n_joints``,
  ``max_obstacles``), iteration caps, and numeric hyperparameters that XLA
  should constant-fold.  Changing any of these recompiles (as in the
  reference, ref: trajectory.py:23-42).
* ``Scenario`` (see :mod:`irm_motion_planning_tpu.ops.scenario`) — runtime
  pytree inputs (start, goal, obstacles).  Changing these never recompiles,
  preserving the reference's signature feature (ref: README.md:25-26).
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Optional, Tuple

# Default GD per-outer-iteration learning-rate schedule (ref: main.py:85-86).
_DEFAULT_GD_LR: Tuple[float, ...] = (
    2e-3, 1e-4, 1e-5, 1e-6, 1e-7, 1e-8, 1e-8, 1e-8, 1e-8, 1e-8,
)

# Fixed-horizon inner-step schedules for the throughput benchmarks: the
# measured per-penalty-round step counts of the reference's early-exit solve
# on the reference scene (BLS: 31/3/1/21/48/10/3/1/1/1 = 120 steps; GD:
# 149/1/5/11/2/0/1/0/0/0 = 169 steps; ref: optimizer_BLS.py:154-179 /
# optimizer_GD.py:175-212 early stops) with ~25% headroom per round so
# fp-path step-count wobble across engines never truncates a round, and
# extra budget in the LATE rounds: there the penalty weights are large
# enough to pull the endpoints down, and a couple of extra steps is what
# separates "constraints satisfied" (BLS: endpoint err 0.0096, measured TPU
# fused path) from the reference's own constraint-violated finish (0.046).
# Budgeted-but-unneeded steps cost (almost) nothing: lanes freeze at the
# loss plateau, and the Pallas kernels skip whole frozen tiles.
#
# BLS endpoint margin (round-4 sweep, benchmarks/schedule_sweep.py,
# SCHED_SWEEP_r04.json): 0.0096 is the DETERMINISTIC FIXED POINT of this
# schedule family — 24 variants land at 0.00956-0.00962 identically
# whenever every round reaches its 1e-3 plateau; extra budget anywhere is
# simply unused, extra MID/LATE-round *accepted* steps overshoot to
# 0.016-0.031, and truncating any round below its plateau jumps to >=0.016.
# There is no <=0.008 schedule within reference semantics (the plateau
# freeze caps the pull — the same mechanism that stops GD at 0.034).
#
# GD (round-3 sweeps, TPU fused kernel, reference scene): the endpoint is
# pulled by rounds 4-8, where the effective endpoint step lambda_sg*gd_lr
# stays ~5e-4/step (lambda rises 10x per violated round while the reference
# lr schedule, ref main.py:85-86, decays); round 9's lambda*lr reaches ~5 —
# unstable, its first trial step raises the loss and the lane freezes, so
# budget there is wasted.  Measured tail ladder (TPU fused, B=128): the
# round-2 tail 8/4/4/4/4/4 ends at 0.061 (WORSE than the reference GD's own
# violated 0.042 finish — retired); 16/32/64/64/32/4 at 0.026 (283 live
# steps); the shipped 16/24/40/40/24/4 at 0.034 (251 live steps) — the
# cheapest tail that keeps ~20% margin under the 0.042 gate against
# fp-path wobble (per-scene outcomes are path-dependent, CLAUDE.md).
# Pushing budget UP past 64s hits the 1e-3 loss-reduction freeze, not the
# budget — eps_position is unreachable under reference GD semantics.
REFERENCE_INNER_SCHEDULE_BLS: Tuple[int, ...] = (48, 8, 4, 32, 64, 16, 8, 8, 8, 8)
REFERENCE_INNER_SCHEDULE_GD: Tuple[int, ...] = (172, 8, 12, 20, 16, 24, 40, 40, 24, 4)

# Final avg/max unpenalized obstacle costs of the reference's flagship runs
# on the reference scene (ref: main.py:141-143), from the runs that produced
# tests/goldens/.  THE single source for every quality gate — bench.py,
# benchmarks/tpu_smoke.py, and tests/test_parity.py all compare against
# these (see ops/costs.py::solution_quality for the matching evaluation).
REFERENCE_FINAL_COST = {
    "bls": (1.6370234, 2.1964114),
    "gd": (1.6673477, 2.2091691),
}


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """Static (compile-time) configuration.  Hashable; safe as a jit static arg.

    Field defaults mirror the reference CLI defaults (ref: main.py:13-102) so a
    default-constructed config reproduces the reference's flagship problem.
    """

    # --- Trajectory parametrization (ref: main.py:33-38) ---
    n_timesteps: int = 50
    rbf_variance: float = 0.1
    mix_scale: float = 0.15  # --jac-gaussian-mean: scale of the random cross-joint mixing matrix
    mix_seed: int = 0        # PRNG seed of the mixing matrix (ref: trajectory.py:42)

    # --- Robot (ref: main.py:89-98) ---
    n_joints: int = 3
    link_length: Tuple[float, ...] = (1.5, 1.0, 0.5)
    max_joint_velocity: float = 7.0
    max_joint_position: float = 2.0
    min_joint_position: float = -1.0

    # --- Environment padding (new: keeps obstacle count static; varying
    # obstacle sets are expressed through per-obstacle weights, never a
    # shape change) ---
    max_obstacles: int = 16

    # --- Loss (ref: main.py:63-70) ---
    lambda_max_cost: float = 0.5
    lambda_reg: float = 1e-4
    constraint_violating_dependant_loss: bool = True
    joint_safety_limit: float = 0.98

    # --- Constraint tolerances (ref: main.py:57-60) ---
    eps_position: float = 0.01
    eps_velocity: float = 0.01

    # --- Penalty-method dual loop (ref: main.py:47-56) ---
    max_outer_iteration: int = 10
    lambda_constraint_increase: float = 10.0
    lambda_sg_constraint: float = 0.5
    lambda_jl_constraint: float = 0.1

    # --- Inner minimization (ref: main.py:41-44) ---
    max_inner_iteration: int = 200
    loop_loss_reduction: float = 1e-3
    # Per-penalty-round inner-step budget for fixed_iters mode (None = every
    # round runs max_inner_iteration).  The reference's early-exit solve
    # distributes its ~120 inner steps very unevenly across penalty rounds
    # (measured on the reference scene: 31/3/1/21/48/10/3/1/1/1 — rounds 0,
    # 3, 4 do nearly all the work), so a UNIFORM fixed budget either starves
    # those rounds (bad solutions) or wastes steps everywhere else.  A
    # schedule keeps the horizon fixed (deterministic, batchable) while
    # matching where the optimization actually spends steps.  Ignored when
    # fixed_iters=False (the early-exit while_loop self-schedules).
    inner_schedule: Optional[Tuple[int, ...]] = None

    # --- Backtracking line search (ref: main.py:73-82) ---
    max_bls_iteration: int = 20
    bls_lr_start: float = 0.2
    bls_alpha: float = 0.01
    bls_beta_plus: float = 1.2
    bls_beta_minus: float = 0.5

    # --- Gradient descent (ref: main.py:85-86) ---
    gd_lr: Tuple[float, ...] = _DEFAULT_GD_LR

    # --- TPU-native execution knobs (no reference equivalent) ---
    # 'sequential' replicates the reference's backtracking while_loop
    # (ref: optimizer_BLS.py:130-150).  'ladder' evaluates the geometric
    # learning-rate ladder lr*beta_minus**j for all j in one batched cost
    # evaluation and selects the first Armijo-passing step — one matmul
    # instead of a data-dependent loop; a far better fit for the MXU.
    bls_mode: Literal["sequential", "ladder"] = "ladder"
    # Run loops to their caps with per-lane done-masking instead of
    # early-exiting while_loops.  Fixed horizons are what batch/shard without
    # divergence stragglers; required for the throughput benchmark.
    fixed_iters: bool = False
    # How the fleet/kernel engines evaluate line-search candidates:
    # 'linearized' (default, fastest) exploits that the RKHS map is linear
    # in alpha — every rung's trajectory is an affine combination of two
    # already-evaluated points, zero basis GEMMs per rung.  Exact in real
    # arithmetic but a different fp path: on the reference scene it lands
    # ~0.6% above the reference's final avg cost.  'exact' evaluates each
    # candidate through the basis GEMMs like the reference does — measured
    # +0.17% avg-cost gap — at the cost of forward GEMMs per rung.
    ladder_eval: Literal["linearized", "exact"] = "linearized"
    # f32 matmul precision on the MXU ('highest' = f32-accurate for parity
    # with the CPU reference; 'default' = bf16 passes, fastest).
    matmul_precision: Literal["default", "high", "highest"] = "highest"
    # Lanes per Pallas kernel tile (batch must be a multiple).  Bigger tiles
    # amortize per-tile scheduling overhead; bounded by VMEM.  0 = choose
    # automatically from the scoped-VMEM model (ops/pallas_step.py::
    # choose_block_b), which also raises the kernel's vmem limit for large
    # problems so no legal choice can OOM at compile time.
    pallas_block_b: int = 0
    # Lane compaction for heterogeneous fleets (backend 'fused' only): run
    # the dual loop as one fused-round kernel launch per penalty round and
    # re-sort lanes ONCE, after round 0, by that round's observed
    # accepted-step count (fulfilled lanes packed last).  A kernel tile
    # stays live until its SLOWEST lane freezes, so grouping
    # similar-convergence lanes lets tiles freeze (and fulfilled tiles skip
    # whole rounds) instead of being pinned live by scattered stragglers.
    # One resort is the measured sweet spot: TPU lane permutation is
    # expensive and later resorts add no signal (policy table in
    # solvers/fleet.py::_pallas_fused_rounds_solve).
    # Per-lane results are BITWISE identical to the whole-solve kernel (all
    # lane ops are elementwise; freeze/skip are identity pass-throughs) —
    # only throughput changes.  Pointless for replicated-scene batches
    # (lanes are already in lockstep); measured on random scenarios in
    # docs/REPORT.md §9.
    lane_compaction: bool = False
    # Run the first k Armijo rungs of the in-kernel BLS ladder BRANCH-FREE
    # before entering the early-exit while-loop (0 = all rungs in the loop).
    # Measured bench-schedule ladder-exit distribution (reference scene):
    # p50 = 1 rung, 79% of steps exit by rung 2, mean 3.19 — so unroll=2
    # lets most steps skip the Mosaic while-loop (and its per-iteration
    # carry/select overhead) at the cost of computing one extra rung body
    # on rung-1 exits.  Bitwise-neutral: the unrolled rungs run the same op
    # sequence as the loop body (pallas_step.rung_eval), and rungs after
    # the first Armijo pass only feed found-masked selects.
    bls_ladder_unroll: int = 2
    # Check the hard constraints on the EXACTLY-evaluated trajectory at each
    # penalty-round end, like the reference (ref: trajectory.py:129-137 runs
    # constraintsFulfilled on evaluate(alpha)).  Only the BLS linearized
    # ladder carries an approximate (traj, vel) — the affine-combination
    # accumulation over a round's inner steps — so for that path the kernel
    # engines re-run the forward basis GEMMs from alpha (one extra forward
    # per penalty round, <1% of a round's compute) before constraints_ok;
    # all other paths (GD, exact ladder, the XLA fleet) already evaluate
    # exactly and ignore this flag.  False = round-3 behavior (constraints
    # on the linearized carried trajectory): measured on TPU (32k random
    # scenes, bench schedule, benchmarks/quality.py --exact-constraint-eval
    # false) that certifies 8.2% of ALL lanes as converged while their
    # exact evaluation VIOLATES the constraints — 30% of the kernels'
    # claimed 27.5% convergence was phantom, and QUALITY_SWEEP_r03's
    # +2.9-pt "surplus" was its net effect.  With True: phantom rate
    # exactly 0, kernels 25.99% converged (exact) vs xla 24.59% — the
    # residual +1.4 pt is genuine fp-path difference in certified-real
    # convergences.  Kept only as an A/B measurement knob.
    exact_constraint_eval: bool = True
    # Refine the in-kernel approximate reciprocal with one Newton step
    # (~1.4e-5 relative error; False = raw hardware approximation, ~2^-12).
    # Both sit below the 5e-3 cross-engine fp noise floor.  Default False:
    # gated on TPU vs the exact-divide xla backend on 32k random scenes
    # (benchmarks/quality.py — cost distributions identical to 1e-4, same
    # converged fraction) and worth +3.3% kernel throughput.
    recip_newton: bool = False
    # bf16 ladder tier for BLS past the f32 kernel wall (T > 2000): the
    # in-step ladder planes are stored half-width, moving the fused-kernel
    # ceiling to the chip-validated T=2200 at 4.3x the XLA fallback's
    # speed and obstacle-cost parity (measured -0.2%) — but direction
    # quantization caps endpoint-pinning precision: converged fraction
    # 1.5% vs the fallback's 11.5% on T=2200 random scenes (uniform-15).
    # OPT-IN because of that trade: default False routes T>2000 to the
    # XLA fallback (quality-first); set True when throughput at extreme
    # problem sizes matters more than the constraint-satisfaction rate.
    bls_bf16_ladder: bool = False

    def __post_init__(self) -> None:
        if self.n_joints != len(self.link_length):
            # ref: robot.py:21-23 validates the same invariant (fatally).
            raise ValueError(
                f"n_joints ({self.n_joints}) and link_length "
                f"({len(self.link_length)}) do not match"
            )
        if self.max_outer_iteration > len(self.gd_lr):
            # ref: optimizer_GD.py:34-36
            raise ValueError(
                "max_outer_iteration exceeds the gd_lr schedule length"
            )
        if self.inner_schedule is not None:
            if len(self.inner_schedule) != self.max_outer_iteration:
                raise ValueError(
                    f"inner_schedule length ({len(self.inner_schedule)}) must "
                    f"equal max_outer_iteration ({self.max_outer_iteration})"
                )
            if any(int(n) < 1 for n in self.inner_schedule):
                raise ValueError("inner_schedule entries must be >= 1")
        # Literal fields are only type HINTS — typos would otherwise flow
        # into string comparisons and silently select a default branch.
        for field, allowed in (
            ("bls_mode", ("sequential", "ladder")),
            ("ladder_eval", ("linearized", "exact")),
            ("matmul_precision", ("default", "high", "highest")),
        ):
            value = getattr(self, field)
            if value not in allowed:
                raise ValueError(f"{field}={value!r} not in {allowed}")

    def replace(self, **kw) -> "PlannerConfig":
        return dataclasses.replace(self, **kw)
