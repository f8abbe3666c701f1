"""Headline benchmark: RKHS trajectory solves/s/chip.

Protocol (mirrors the reference's methodology, ref: main.py:117-129 — JIT
warm-up excluded, block_until_ready, repeated measurements):

* the reference scene replicated into a batch, flagship BLS solver — each
  batch lane performs exactly the work of one reference solve (identical
  lanes take identical early-exit paths), so solves/s is apples-to-apples
  with the reference's per-solve latency,
* baseline: the reference's published flagship number — 3.12 ms per solve
  on CPU (DevBlog blog-post.html:389) = 320.5 solves/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import batched

REF_SOLVE_SECONDS = 3.12e-3  # DevBlog blog-post.html:389
BASELINE_SOLVES_PER_SEC = 1.0 / REF_SOLVE_SECONDS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--solver", choices=["bls", "gd"], default="bls")
    p.add_argument("--engine", choices=["fleet", "vmap"], default="fleet",
                   help="fleet = batch-trailing MXU layout; vmap = per-lane")
    args = p.parse_args()

    cfg = mp.PlannerConfig(bls_mode="ladder")
    basis = mp.make_basis(cfg)
    scns = mp.replicate_scenario(mp.reference_scenario(cfg), args.batch)
    if args.engine == "fleet":
        from irm_motion_planning_tpu.solvers import fleet

        run = fleet.make_fleet_solver(cfg, basis, solver=args.solver)
    else:
        run = batched.make_batched_solver(cfg, basis, solver=args.solver)

    # Warm-up: compile + first execution excluded (ref: optimizer_BLS.py:50-54).
    t0 = time.time()
    jax.block_until_ready(run(scns))
    compile_s = time.time() - t0

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        jax.block_until_ready(run(scns))
        times.append(time.time() - t0)

    best = min(times)
    solves_per_sec = args.batch / best
    result = {
        "metric": f"{args.solver}_{args.engine}_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# batch={args.batch} best={best*1000:.1f}ms "
        f"mean={1000*sum(times)/len(times):.1f}ms compile+first={compile_s:.1f}s "
        f"per-solve={1e6*best/args.batch:.1f}us",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
