"""Inner-schedule sweep on the reference scene via the per-round kernel.

The per-round fused kernel takes the round's inner budget as a RUNTIME SMEM
scalar (ops/pallas_step.py::fused_round), and its driver loop reproduces the
whole-solve kernel bitwise (tests/test_fleet_fused.py) — so schedule
variants share ONE Mosaic compilation and a sweep costs milliseconds per
candidate instead of a ~3-minute remote recompile each.  Used to tune
config.REFERENCE_INNER_SCHEDULE_* endpoint margins (VERDICT r3 #2).

Usage:
  python benchmarks/schedule_sweep.py                 # builtin candidates
  python benchmarks/schedule_sweep.py --schedules "48,8,4,32,64,16,8,8,8,8;48,8,4,32,80,24,8,8,8,8"
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
from irm_motion_planning_tpu.ops import pallas_step
from irm_motion_planning_tpu.solvers import fleet


def run_schedule(cfg, basis, fs, a0k, sched, block_b, solver="bls"):
    """Dual solve with an EXTERNAL per-round budget list (cfg stays fixed so
    every candidate reuses the same compiled fused_round)."""
    B = a0k.shape[-1]
    kv, kvt, mixm = basis.kv, basis.kv.T, basis.mix
    inc = jnp.float32(cfg.lambda_constraint_increase)
    alpha = a0k
    lam_sg = jnp.full((1, B), cfg.lambda_sg_constraint, jnp.float32)
    lam_jl = jnp.full((1, B), cfg.lambda_jl_constraint, jnp.float32)
    ful = jnp.zeros((1, B), jnp.float32)
    total_inner = jnp.zeros((1, B), jnp.float32)
    gd = [float(x) for x in cfg.gd_lr]
    for r, n_r in enumerate(sched):
        lr0 = jnp.full(
            (1, B),
            cfg.bls_lr_start if solver == "bls" else gd[min(r, len(gd) - 1)],
            jnp.float32,
        )
        out = pallas_step.fused_round(
            cfg, kv, kvt, mixm, alpha, lam_sg, lam_jl, ful, lr0, int(n_r),
            fs.start, fs.goal,
            fs.obstacles[:, 0, :], fs.obstacles[:, 1, :], fs.obstacle_weight,
            solver=solver, block_b=block_b,
        )
        now = jnp.maximum(ful, out.ok)
        lam_sg = jnp.where(now > 0.5, lam_sg, lam_sg * inc)
        lam_jl = jnp.where(now > 0.5, lam_jl, lam_jl * inc)
        total_inner = total_inner + out.inner
        ful, alpha = now, out.alpha
    return alpha, float(np.asarray(total_inner[0, 0]))


DEFAULT_BLS = [
    # shipped (round 3): endpoint 0.0096 — 4% margin under eps 0.01
    (48, 8, 4, 32, 64, 16, 8, 8, 8, 8),
    # late-round budget variants (CLAUDE.md: late rounds pull the endpoint)
    (48, 8, 4, 32, 80, 16, 8, 8, 8, 8),
    (48, 8, 4, 32, 96, 24, 8, 8, 8, 8),
    (48, 8, 4, 32, 64, 32, 16, 8, 8, 8),
    (48, 8, 4, 32, 64, 16, 16, 16, 8, 8),
    (48, 8, 4, 40, 80, 24, 8, 8, 8, 8),
    (48, 8, 4, 24, 64, 16, 8, 8, 8, 8),
    (48, 8, 4, 32, 72, 20, 8, 8, 8, 8),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--solver", choices=["bls", "gd"], default="bls")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--block-b", type=int, default=128)
    p.add_argument("--schedules", default=None,
                   help="semicolon-separated comma lists; default = builtin "
                        "BLS candidates")
    args = p.parse_args()

    if args.schedules:
        cands = [tuple(int(x) for x in s.split(","))
                 for s in args.schedules.split(";")]
    else:
        cands = DEFAULT_BLS

    mx = max(max(s) for s in cands)
    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True, max_inner_iteration=mx,
        max_obstacles=11, pallas_block_b=args.block_b,
    )
    basis = mp.make_basis(cfg)
    scn0 = mp.reference_scenario(cfg)
    scns = mp.replicate_scenario(scn0, args.batch)
    fs = fleet.to_fleet(scns)
    a0k = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)

    ref_avg, ref_max = mp.REFERENCE_FINAL_COST[args.solver]
    for sched in cands:
        alpha, steps = run_schedule(cfg, basis, fs, a0k, sched,
                                    args.block_b, solver=args.solver)
        a0 = fleet.alpha_from_fleet(jnp.moveaxis(alpha, 0, 1))[0]
        q = mp.solution_quality(cfg, basis, scn0, a0)
        print(json.dumps({
            "sched": list(sched), "total_budget": int(sum(sched)),
            "live_steps": round(steps, 0),
            "avg_cost": round(float(q["avg_cost"]), 4),
            "max_cost": round(float(q["max_cost"]), 4),
            "endpoint_err": round(float(q["endpoint_err"]), 5),
            "avg_gap_pct": round(
                100 * (float(q["avg_cost"]) / ref_avg - 1), 2),
        }))


if __name__ == "__main__":
    main()
