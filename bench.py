"""Headline benchmark: RKHS trajectory solves/s/chip, WITH a quality gate.

Protocol (timing methodology mirrors the reference, ref: main.py:117-129 —
JIT warm-up excluded, block_until_ready, repeated measurements):

* the reference scene replicated into a batch, flagship BLS solver, at a
  FIXED per-round iteration schedule (config.REFERENCE_INNER_SCHEDULE_BLS):
  the measured per-penalty-round step counts of the reference's early-exit
  solve (31/3/1/21/48/10/3/1/1/1 = 120 steps on the reference scene,
  ref: optimizer_BLS.py:154-179) with ~25% headroom per round.  A fixed
  schedule keeps the horizon deterministic AND spends steps where the
  reference's own early-exit run spends them — a uniform fixed budget
  (e.g. 10x15) truncates the heavy rounds and lands at visibly worse
  solutions (avg cost 1.72 vs 1.64; that was round 1's headline bug),
* QUALITY IS GATED, not just reported: the run fails (exit 1, "quality_ok":
  false) unless the solved reference scene lands within --quality-tol
  (default 2%) of the reference's final avg/max obstacle cost
  (config.REFERENCE_FINAL_COST, ref: main.py:141-143) AND satisfies the
  hard constraints (endpoint error < eps_position = 0.01 — which the
  reference's own flagship run does NOT: it terminates with 0.046).  The
  residual ~0.65% avg-cost gap is the LINEARIZED ladder's fp path;
  --ladder-eval exact evaluates candidates through the basis GEMMs like
  the reference and lands BELOW the reference's avg cost at equal max cost
  (ending constraint-violated like the reference — its endpoint gate is
  the reference's own 0.046 finish plus slack).  The sequential parity
  engine reproduces the reference bitwise (tests/test_parity.py),
* the obstacle-slot bound defaults to the reference scene's 11 (exactly
  the obstacle set the reference computes; zero-weight padding is exact),
* baseline: the reference's published flagship number — 3.12 ms per solve
  on CPU (DevBlog blog-post.html:389) = 320.5 solves/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", quality...}.
"""

import argparse
import json
import os
import sys
import time

import jax

# Persistent compilation cache: the solver program is large (fused loops) and
# remote TPU compiles are slow; cache executables on disk so repeat benchmark
# runs skip straight to execution.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import batched

# Per-solver reference flagships (DevBlog blog-post.html:389-390): the
# full-JIT-loop CPU solve times.  vs_baseline compares like with like.
REF_SOLVE_SECONDS = {"bls": 3.12e-3, "gd": 7.26e-3}
SCHEDULES = {
    "bls": mp.REFERENCE_INNER_SCHEDULE_BLS,
    "gd": mp.REFERENCE_INNER_SCHEDULE_GD,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1048576,
                   help="scenario lanes; throughput rises with batch "
                        "(fixed overheads amortize; VPU fills — measured "
                        "+0.8%% from 512k to 1M, r5)")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--solver", choices=["bls", "gd"], default="bls")
    p.add_argument("--engine", choices=["fleet", "vmap"], default="fleet",
                   help="fleet = batch-trailing MXU layout; vmap = per-lane")
    p.add_argument("--backend", choices=["fused", "pallas", "xla"],
                   default="fused",
                   help="fleet backend: fused = whole-solve VMEM-resident "
                        "kernel, pallas = per-step kernel, xla = portable")
    p.add_argument("--inner", type=int, default=None,
                   help="UNIFORM fixed inner steps per penalty round; "
                        "overrides the default per-round schedule (see "
                        "config.REFERENCE_INNER_SCHEDULE_*)")
    p.add_argument("--matmul-precision",
                   choices=["default", "high", "highest"], default="highest",
                   help="basis-GEMM precision (kernel dots follow this)")
    p.add_argument("--block-b", type=int, default=None,
                   help="pallas lane-tile width (batch %% block_b == 0). "
                        "Default: 512 replicated (tuned round 2), 128 with "
                        "--random-scenarios (heterogeneous lanes freeze at "
                        "different steps; finer tiles freeze earlier — "
                        "measured +21%% over 512 at 512k random scenes)")
    p.add_argument("--recip-newton", type=lambda x: str(x).lower() == "true",
                   default=False,
                   help="refine the in-kernel approx reciprocal (default "
                        "False = raw hw approximation, quality-gated; see "
                        "config.recip_newton)")
    p.add_argument("--max-obstacles", type=int, default=11,
                   help="static obstacle-slot bound; the kernels compute "
                        "every slot (zero-weight padding contributes exactly "
                        "0, tests/test_parity.py::test_obstacle_padding_is_"
                        "exact), so the default sizes it to the reference "
                        "scene's 11 obstacles — the same work the reference "
                        "computes.  Raise it for runtime-varying scenes")
    p.add_argument("--ladder-eval", choices=["linearized", "exact"],
                   default="linearized")
    p.add_argument("--ladder-unroll", type=int, default=2,
                   help="first k Armijo rungs branch-free before the "
                        "early-exit while ladder (config.bls_ladder_unroll; "
                        "bitwise-neutral, throughput-only)")
    p.add_argument("--quality-tol", type=float, default=0.02,
                   help="gate: allowed relative avg/max-cost excess over the "
                        "reference's final costs at this exact config")
    p.add_argument("--random-scenarios", action="store_true",
                   help="HETEROGENEOUS-fleet mode: every lane gets a random "
                        "scene (random_scenarios) instead of a replica of "
                        "the reference scene.  Lanes then freeze at "
                        "different steps, so whole-tile freeze-skip buys "
                        "less — this is the mixed-workload throughput "
                        "number to quote beside the replicated-scene "
                        "headline.  The reference-scene quality gate does "
                        "not apply; the run reports the converged fraction "
                        "and mean final cost of the batch instead")
    p.add_argument("--seed", type=int, default=0,
                   help="random-scenario seed (--random-scenarios only)")
    p.add_argument("--quality-check-lanes", type=int, default=32768,
                   help="heterogeneous mode: re-solve this many of the SAME "
                        "scenes with the xla backend and gate the measured "
                        "backend's converged fraction / mean cost against "
                        "it (plus exact-eval phantom check).  0 disables "
                        "(finiteness-only gate)")
    p.add_argument("--lane-compaction",
                   type=lambda x: str(x).lower() == "true", default=None,
                   help="heterogeneous-fleet mode: per-round fused kernel + "
                        "between-round lane re-sorting so tiles freeze "
                        "together (bitwise-equal per lane; pointless for "
                        "replicated scenes).  Default: ON with "
                        "--random-scenarios on the fused backend (measured "
                        "+12%% at the heterogeneous tile width), off "
                        "otherwise")
    args = p.parse_args()

    if args.block_b is None:
        args.block_b = 128 if args.random_scenarios else 512
    if args.lane_compaction is None:
        args.lane_compaction = bool(
            args.random_scenarios and args.backend == "fused"
        )

    if args.inner is not None:
        sched_kw = dict(max_inner_iteration=args.inner)
    else:
        sched = SCHEDULES[args.solver]
        sched_kw = dict(inner_schedule=sched, max_inner_iteration=max(sched))
    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True,
        matmul_precision=args.matmul_precision,
        pallas_block_b=args.block_b,
        recip_newton=args.recip_newton,
        max_obstacles=args.max_obstacles,
        ladder_eval=args.ladder_eval,
        lane_compaction=args.lane_compaction,
        bls_ladder_unroll=args.ladder_unroll,
        **sched_kw,
    )
    basis = mp.make_basis(cfg)
    if args.random_scenarios:
        scns = mp.random_scenarios(
            cfg, jax.random.PRNGKey(args.seed), args.batch
        )
    else:
        scns = mp.replicate_scenario(mp.reference_scenario(cfg), args.batch)
    if args.engine == "fleet":
        from irm_motion_planning_tpu.solvers import fleet

        run = fleet.make_fleet_solver(
            cfg, basis, solver=args.solver, backend=args.backend
        )
    else:
        run = batched.make_batched_solver(cfg, basis, solver=args.solver)

    # Completion barrier: through the remote-TPU tunnel block_until_ready
    # can return before pure-XLA loop programs finish (CLAUDE.md), so every
    # timed run ends with a scalar host fetch.
    import jax.numpy as jnp

    def run_to_completion():
        out = run(scns)
        float(jnp.sum(out.stats.final_cost))
        return out

    # Warm-up: compile + first execution excluded (ref: optimizer_BLS.py:50-54).
    t0 = time.time()
    warm = run_to_completion()
    compile_s = time.time() - t0
    if args.random_scenarios:
        # Heterogeneous fleet: no single reference solution to gate against,
        # so gate DISTRIBUTIONALLY on the same scenes (VERDICT r4 #2): a
        # paired subsample is re-solved with the portable xla backend and
        # the measured backend must match its converged fraction and mean
        # final cost within the documented fp-path noise bands, and the
        # measured backend's converged flags must be certified by exact
        # constraint evaluation (phantom_frac ~ 0, up to a 1-ulp boundary
        # wobble — see QUALITY_SWEEP_r04 seed 3).
        import numpy as np

        from irm_motion_planning_tpu.solvers import fleet as fleet_mod

        conv = np.asarray(warm.stats.converged)
        conv_frac = float(conv.mean())
        mean_cost = float(jnp.mean(warm.stats.final_cost))
        quality_ok = bool(np.isfinite(mean_cost))
        quality_fields = {
            "scenarios": "random",
            "converged_frac": round(conv_frac, 4),
            "mean_final_cost": round(mean_cost, 4),
        }
        quality_msg = (
            f"random scenes: converged_frac={conv_frac:.4f} "
            f"mean_final_cost={mean_cost:.4f}"
        )
        n_check = min(args.batch, args.quality_check_lanes)
        if n_check and args.engine == "fleet" and args.backend != "xla":
            sub = jax.tree_util.tree_map(lambda x: x[:n_check], scns)
            fsub = fleet_mod.to_fleet(sub)
            alpha_sub = warm.alpha[:n_check]
            ok_exact = np.asarray(
                jax.jit(lambda a: fleet_mod.fleet_constraints(
                    cfg, basis, fsub, a))(fleet_mod.alpha_to_fleet(alpha_sub))
            )
            phantom = float(np.mean(conv[:n_check] & ~ok_exact))
            ref_cfg = cfg.replace(lane_compaction=False)  # fused-only knob
            ref_run = fleet_mod.make_fleet_solver(
                ref_cfg, basis, solver=args.solver, backend="xla"
            )
            ref = jax.block_until_ready(ref_run(sub))
            ref_conv = float(np.asarray(ref.stats.converged).mean())
            sub_conv = float(conv[:n_check].mean())
            # Compare UNPENALIZED solution quality (the blended obstacle
            # cost of the final trajectory, the reference's own report) —
            # the penalized stats.final_cost carries the lane's final
            # lambda (x10 per escalation), so its mean is dominated by
            # how many rounds unconverged lanes happened to run, not by
            # solution quality.
            pen0 = mp.Penalty(jnp.float32(0), jnp.float32(0))
            qual = jax.jit(jax.vmap(
                lambda s, a: mp.total_cost(cfg, basis, s, pen0, a)))
            sub_cost = float(jnp.mean(qual(sub, alpha_sub)))
            ref_cost = float(jnp.mean(qual(sub, ref.alpha)))
            # Bands from benchmarks/quality.py: boundary-lane flips at the
            # sharp eps thresholds scale with the converged population.
            conv_band = max(0.02, min(0.15 * max(ref_conv, sub_conv), 0.05))
            cost_band = 0.01 * max(abs(ref_cost), 1e-6)
            quality_ok = bool(
                np.isfinite(mean_cost)
                and phantom <= 2.0 / n_check  # <=2-lane boundary wobble
                and abs(sub_conv - ref_conv) <= conv_band
                and abs(sub_cost - ref_cost) <= cost_band
            )
            quality_fields.update({
                "paired_check_lanes": n_check,
                "phantom_frac": round(phantom, 6),
                "xla_converged_frac": round(ref_conv, 4),
                "mean_obstacle_cost": round(sub_cost, 4),
                "xla_mean_obstacle_cost": round(ref_cost, 4),
            })
            quality_msg += (
                f" | paired xla check on {n_check} lanes: conv "
                f"{sub_conv:.4f} vs {ref_conv:.4f} (band {conv_band:.3f}), "
                f"obstacle cost {sub_cost:.4f} vs {ref_cost:.4f} (band "
                f"{cost_band:.4f}), phantom_frac {phantom:.2e}"
            )
    else:
        # Quality of lane 0 (all lanes identical): unpenalized obstacle
        # costs + endpoint error, comparable to the reference's final report
        # (ref: main.py:141-143: avg 1.637 / max 2.196, endpoint err 0.046 —
        # i.e. the reference's own flagship run terminates
        # constraint-VIOLATED).
        scn0 = mp.reference_scenario(cfg)
        q = mp.solution_quality(cfg, basis, scn0, warm.alpha[0])
        avg_cost = float(q["avg_cost"])
        max_cost = float(q["max_cost"])
        endpoint_err = float(q["endpoint_err"])
        ref_avg, ref_max = mp.REFERENCE_FINAL_COST[args.solver]
        # BLS with the linearized ladder (the headline) must SATISFY the
        # hard constraints — a strictly stronger outcome than the reference,
        # whose flagship run terminates violated at endpoint err 0.046.  The
        # exact ladder tracks the reference's own optimization path
        # (measured: avg cost BETTER than the reference at equal max cost)
        # and, like the reference, ends violated — its gate is the
        # reference's own endpoint (0.046) plus slack.  GD runs the
        # late-round-weighted schedule (config.REFERENCE_INNER_SCHEDULE_GD,
        # tuned round 3; tail trimmed to 251 live steps): measured endpoint
        # 0.0344 at the 256k headline config — STRICTLY BETTER
        # than the reference GD's own violated 0.042 finish (reaching
        # eps_position is blocked by reference semantics: the late rounds'
        # lambda*lr product turns unstable at round 9 and the 1e-3
        # loss-reduction stop freezes lanes first).  Its gate is the
        # reference's own 0.042: our GD must end no more violated than the
        # reference's GD.  Pinned in tests/test_quality_gate.py.
        if args.solver == "bls":
            endpoint_bound = (
                cfg.eps_position if args.ladder_eval == "linearized" else 0.05
            )
        else:
            endpoint_bound = 0.042
        quality_ok = (
            avg_cost <= ref_avg * (1.0 + args.quality_tol)
            and max_cost <= ref_max * (1.0 + args.quality_tol)
            and endpoint_err < endpoint_bound
        )
        quality_fields = {
            "avg_cost": round(avg_cost, 4),
            "max_cost": round(max_cost, 4),
            "ref_avg_cost": round(ref_avg, 4),
            "ref_max_cost": round(ref_max, 4),
            "endpoint_err": round(endpoint_err, 4),
        }
        quality_msg = (
            f"avg_cost={avg_cost:.4f} max_cost={max_cost:.4f} "
            f"endpoint_err={endpoint_err:.4f} "
            f"(ref: {ref_avg:.4f}/{ref_max:.4f}; endpoint gate: "
            f"err < {endpoint_bound} — the reference's own flagship runs "
            f"end violated at 0.046/0.042)"
        )

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        run_to_completion()
        times.append(time.time() - t0)

    best = min(times)
    solves_per_sec = args.batch / best
    baseline = 1.0 / REF_SOLVE_SECONDS[args.solver]
    result = {
        "metric": f"{args.solver}_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / baseline, 2),
        "quality_ok": quality_ok,
        **quality_fields,
    }
    print(json.dumps(result))
    print(
        f"# batch={args.batch} best={best*1000:.1f}ms "
        f"mean={1000*sum(times)/len(times):.1f}ms compile+first={compile_s:.1f}s "
        f"per-solve={1e6*best/args.batch:.1f}us "
        f"quality[{'PASS' if quality_ok else 'FAIL'}]: " + quality_msg,
        file=sys.stderr,
    )
    return 0 if quality_ok else 1


if __name__ == "__main__":
    sys.exit(main())
