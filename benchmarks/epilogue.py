"""Direct on-chip measurement of the BLS step's phase costs (VERDICT r4 #4).

REPORT round 4 *inferred* the step-time decomposition (ladder ~40%,
epilogue ~60%) from one A/B point (ladder unroll k=3 costing -12%).  This
benchmark measures each phase directly: it times the headline fused kernel
with one phase ABLATED at a time (wrong results by construction — the
deltas are timing evidence only, see ops/pallas_step.py::_ABLATE):

  * ladder1      — Armijo ladder capped at ONE rung (removes rungs 2+:
                   their FK + obstacle field + scalar cost evaluations)
  * dir_forward  — search-direction forward GEMM removed
  * pullback     — end-of-step fused cost/grad pull-back removed (the
                   gradient GEMMs + FK jacobian + obstacle gradient)
  * fk           — the rung evaluation's 2J-sincos FK rollout removed
  * obsfield     — the rung evaluation's O(O*T) reciprocal obstacle field
                   removed

Phase share = (t_full - t_ablated) / t_full.  Shares need not sum to 1
(ablations overlap on compiler scheduling slack); they bound each phase's
direct contribution.

Usage (real TPU): python benchmarks/epilogue.py --batch 262144
Prints one JSON line with per-variant times and derived shares.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

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


def measure(cfg, basis, scns, repeats):
    run = fleet.make_fleet_solver(cfg, basis, solver="bls", backend="fused")
    def once():
        out = run(scns)
        np.asarray(jnp.sum(out.stats.final_cost))  # tunnel-safe barrier
        return out
    once()  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.time()
        once()
        times.append(time.time() - t0)
    return min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=262144)
    p.add_argument("--block-b", type=int, default=512)
    p.add_argument("--repeats", type=int, default=4)
    args = p.parse_args()

    sched = mp.REFERENCE_INNER_SCHEDULE_BLS
    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True,
        inner_schedule=sched, max_inner_iteration=max(sched),
        max_obstacles=11, pallas_block_b=args.block_b,
        recip_newton=False,
    )
    basis = mp.make_basis(cfg)
    scns = mp.replicate_scenario(mp.reference_scenario(cfg), args.batch)

    rows = {}
    for variant in (None, "ladder1", "dir_forward", "pullback", "fk",
                    "obsfield"):
        pallas_step._ABLATE = variant
        try:
            t = measure(cfg, basis, scns, args.repeats)
        finally:
            pallas_step._ABLATE = None
        rows[variant or "full"] = t
        print(f"# {variant or 'full'}: {t*1000:.1f} ms "
              f"({args.batch/t:.0f} solves/s)", file=sys.stderr)

    full = rows["full"]
    shares = {
        k: round((full - v) / full, 4)
        for k, v in rows.items() if k != "full"
    }
    print(json.dumps({
        "metric": "bls_step_phase_shares",
        "batch": args.batch,
        "block_b": args.block_b,
        "times_ms": {k: round(1e3 * v, 2) for k, v in rows.items()},
        "share_of_step": shares,
        "note": "share = (t_full - t_ablated)/t_full; ablations produce "
                "wrong results by construction (timing evidence only)",
    }))


if __name__ == "__main__":
    main()
