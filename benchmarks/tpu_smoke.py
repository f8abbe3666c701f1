"""Real-TPU smoke gate: compile and run the Mosaic kernel paths on the
actual chip and check them against the XLA backend.

Everything else in tests/ runs the Pallas kernels in INTERPRET mode on CPU,
which validates kernel semantics but not Mosaic lowering — an op Mosaic
cannot lower (or lowers wrongly) would pass the whole suite.  This gate
compiles and executes, on the real TPU:

* the fused whole-solve kernel (backend='fused'), BLS + GD,
* the per-step kernel path (backend='pallas'),
* at 128-lane tiles (the minimum Mosaic-legal lane width) on the reference
  scene AND a random-scene batch,

and asserts (a) every output finite, (b) reference-scene quality within the
declared tolerance of the reference's final costs (same gate as bench.py),
(c) kernel-vs-XLA agreement on the random batch, distribution-level
(mean final cost within 1%, converged fraction within 0.05 — per-lane
outcomes are fp-path-dependent, CLAUDE.md).

Usage: python benchmarks/tpu_smoke.py        (default env = the TPU)
Prints one JSON line; exit 0 iff all checks pass.  Runtime after the
compile cache is warm: a few seconds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import fleet

REF_QUALITY = mp.REFERENCE_FINAL_COST


def lane0_quality(cfg, basis, scn, res):
    q = mp.solution_quality(cfg, basis, scn, jnp.asarray(np.asarray(res.alpha[0])))
    return float(q["avg_cost"]), float(q["max_cost"]), float(q["endpoint_err"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--tol", type=float, default=0.02)
    args = p.parse_args()

    platform = jax.devices()[0].platform
    checks = {}
    ok = True

    def record(name, passed, detail):
        nonlocal ok
        checks[name] = {"pass": bool(passed), **detail}
        ok = ok and bool(passed)

    # --- Reference-scene quality through the Mosaic kernels ---
    for solver in ("bls", "gd"):
        sched = {"bls": mp.REFERENCE_INNER_SCHEDULE_BLS,
                 "gd": mp.REFERENCE_INNER_SCHEDULE_GD}[solver]
        cfg = mp.PlannerConfig(
            bls_mode="ladder", fixed_iters=True, pallas_block_b=128,
            inner_schedule=sched, max_inner_iteration=max(sched),
        )
        basis = mp.make_basis(cfg)
        scn = mp.reference_scenario(cfg)
        scns = mp.replicate_scenario(scn, args.batch)
        res = jax.block_until_ready(
            fleet.make_fleet_solver(cfg, basis, solver=solver,
                                    backend="fused")(scns)
        )
        finite = bool(np.isfinite(np.asarray(res.alpha)).all())
        avg, mx, err = lane0_quality(cfg, basis, scn, res)
        ref_avg, ref_max = REF_QUALITY[solver]
        # GD gate = the reference GD's own violated finish (bench.py gates
        # the same 0.042; the round-3 schedule lands ~0.026 on-chip).
        endpoint_bound = cfg.eps_position if solver == "bls" else 0.042
        record(
            f"fused_{solver}_reference_scene",
            finite and avg <= ref_avg * (1 + args.tol)
            and mx <= ref_max * (1 + args.tol) and err < endpoint_bound,
            {"avg_cost": round(avg, 4), "max_cost": round(mx, 4),
             "endpoint_err": round(err, 4), "finite": finite},
        )

    # --- Exact-ladder mode through the fused Mosaic kernel: tracks the
    # reference's own path (per-rung forward GEMMs) — avg cost must match
    # or beat the reference's, max cost within tol, endpoint within the
    # reference's own violated finish (0.046) + slack ---
    sched = mp.REFERENCE_INNER_SCHEDULE_BLS
    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True, pallas_block_b=128,
        ladder_eval="exact",
        inner_schedule=sched, max_inner_iteration=max(sched),
    )
    basis = mp.make_basis(cfg)
    scn = mp.reference_scenario(cfg)
    res = jax.block_until_ready(
        fleet.make_fleet_solver(cfg, basis, backend="fused")(
            mp.replicate_scenario(scn, args.batch))
    )
    avg, mx, err = lane0_quality(cfg, basis, scn, res)
    ref_avg, ref_max = REF_QUALITY["bls"]
    record(
        "fused_bls_exact_ladder_reference_scene",
        bool(np.isfinite(np.asarray(res.alpha)).all())
        and avg <= ref_avg * (1 + args.tol)
        and mx <= ref_max * (1 + args.tol) and err < 0.05,
        {"avg_cost": round(avg, 4), "max_cost": round(mx, 4),
         "endpoint_err": round(err, 4)},
    )

    # --- Tiled-T (streamed basis) Mosaic lowering: the streamed fused
    # solve must be BITWISE equal to the resident kernel on-chip (blocked
    # dot rows are the same full-length dot products).  Small T keeps the
    # compile cheap; both a dividing row block and a remainder block. ---
    from irm_motion_planning_tpu.ops import pallas_step as ps

    cfg = mp.PlannerConfig(
        n_timesteps=64, bls_mode="ladder", fixed_iters=True,
        max_inner_iteration=4, max_outer_iteration=3, max_bls_iteration=8,
    )
    basis = mp.make_basis(cfg)
    scns64 = mp.random_scenarios(cfg, jax.random.PRNGKey(3), args.batch)
    fs = fleet.to_fleet(scns64)
    a0 = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)
    kargs = (cfg, basis.kv, basis.kv.T, basis.mix, a0,
             jnp.full((1, args.batch), cfg.lambda_sg_constraint, jnp.float32),
             jnp.full((1, args.batch), cfg.lambda_jl_constraint, jnp.float32),
             fs.start, fs.goal,
             fs.obstacles[:, 0, :], fs.obstacles[:, 1, :], fs.obstacle_weight)
    resident = np.asarray(
        ps.fused_solve(*kargs, solver="bls", block_b=128, stream_rb=0).alpha
    )
    for rb in (16, 24):  # 24 does not divide 64: remainder-block path
        streamed = np.asarray(
            ps.fused_solve(*kargs, solver="bls", block_b=128,
                           stream_rb=rb).alpha
        )
        record(
            f"streamed_rb{rb}_bitwise_vs_resident",
            np.array_equal(resident, streamed)
            and bool(np.isfinite(streamed).all()),
            {"bitwise": bool(np.array_equal(resident, streamed))},
        )

    # --- Per-round driver (lane_compaction) vs the whole-solve kernel,
    # ON-CHIP: these are two separately Mosaic-compiled programs sharing
    # one traced round body (run_inner), and the per-round driver claims
    # per-lane BITWISE invariance under compaction (fleet.py docstring;
    # pinned under interpret by tests/test_fleet_fused.py) — verify the
    # claim holds across real Mosaic compilations too. ---
    cfg_r = cfg.replace(lane_compaction=True, pallas_block_b=128)
    rounds_res = jax.block_until_ready(
        fleet.make_fleet_solver(cfg_r, basis, backend="fused")(scns64)
    )
    whole_res = jax.block_until_ready(
        fleet.make_fleet_solver(cfg.replace(pallas_block_b=128), basis,
                                backend="fused")(scns64)
    )
    bitwise = bool(np.array_equal(np.asarray(rounds_res.alpha),
                                  np.asarray(whole_res.alpha)))
    record(
        "fused_rounds_compaction_bitwise_vs_whole_solve",
        bitwise and bool(np.isfinite(np.asarray(rounds_res.alpha)).all())
        and np.array_equal(np.asarray(rounds_res.stats.converged),
                           np.asarray(whole_res.stats.converged)),
        {"bitwise": bitwise,
         "conv_equal": bool(np.array_equal(
             np.asarray(rounds_res.stats.converged),
             np.asarray(whole_res.stats.converged)))},
    )

    # --- Kernel backends vs XLA on a random batch, distributional ---
    cfg = mp.PlannerConfig(bls_mode="ladder", fixed_iters=True,
                           max_inner_iteration=15, pallas_block_b=128)
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(7), args.batch)
    stats = {}
    for backend in ("xla", "pallas", "fused"):
        res = jax.block_until_ready(
            fleet.make_fleet_solver(cfg, basis, backend=backend)(scns)
        )
        finite = bool(np.isfinite(np.asarray(res.alpha)).all())
        stats[backend] = {
            "finite": finite,
            "mean_cost": float(np.mean(np.asarray(res.stats.final_cost))),
            "conv": float(np.mean(np.asarray(res.stats.converged))),
        }
    for backend in ("pallas", "fused"):
        s, x = stats[backend], stats["xla"]
        record(
            f"{backend}_vs_xla_random",
            s["finite"] and x["finite"]
            and abs(s["mean_cost"] - x["mean_cost"])
            <= 0.01 * max(abs(x["mean_cost"]), 1e-6)
            and abs(s["conv"] - x["conv"]) <= 0.05,
            {"mean_cost": round(s["mean_cost"], 4),
             "xla_mean_cost": round(x["mean_cost"], 4),
             "conv": round(s["conv"], 4), "xla_conv": round(x["conv"], 4)},
        )

    print(json.dumps({
        "metric": "tpu_smoke", "platform": platform,
        "batch": args.batch, "pass": ok, "checks": checks,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
