"""Problem-size scaling: per-solve time vs number of support timesteps T.

Reproduces the reference's published scaling study (DevBlog
blog-post.html:445-454: runtime grows linearly to ~100 support points, then
quadratically — the T x T kernel Gram matrices dominate).  On TPU the
crossover moves right: the Gram GEMMs ride the MXU, so small-T solves are
VPU/overhead-bound and the quadratic term only shows once 2T x T tiles
saturate the MXU.

Each T is a separate compile (T is a static shape); the persistent
compilation cache makes re-runs cheap.

Usage:  python benchmarks/problemsize.py [--sizes 25,50,100,150,200]
Prints one JSON line per size plus a summary line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import fleet


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="25,50,100,150,200")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--solver", choices=["bls", "gd"], default="bls")
    p.add_argument("--backend", choices=["fused", "pallas", "xla"],
                   default="xla",
                   help="xla by default: every T is a fresh compile and the "
                        "Pallas kernels compile slowly on remote TPU")
    p.add_argument("--inner", type=int, default=15)
    args = p.parse_args()

    rows = []
    for T in [int(s) for s in args.sizes.split(",")]:
        # pallas_block_b=0: lane tiles auto-sized from the scoped-VMEM model
        # (and the kernel's vmem limit raised for large T) — see
        # ops/pallas_step.py::choose_block_b.
        cfg = mp.PlannerConfig(
            n_timesteps=T, bls_mode="ladder", fixed_iters=True,
            max_inner_iteration=args.inner, pallas_block_b=0,
        )
        basis = mp.make_basis(cfg)
        scns = mp.replicate_scenario(mp.reference_scenario(cfg), args.batch)
        run = fleet.make_fleet_solver(cfg, basis, solver=args.solver,
                                      backend=args.backend)

        # NB: through the remote-TPU tunnel, block_until_ready can return
        # BEFORE pure-XLA loop programs finish executing — a host fetch of
        # an output is the only reliable completion barrier (CLAUDE.md).
        def run_to_completion():
            return float(np.asarray(run(scns).stats.final_cost).sum())

        t0 = time.time()
        run_to_completion()
        compile_s = time.time() - t0
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            run_to_completion()
            times.append(time.time() - t0)
        best = min(times)
        rows.append({
            "n_timesteps": T,
            "per_solve_us": round(1e6 * best / args.batch, 2),
            "solves_per_sec": round(args.batch / best, 1),
            "compile_s": round(compile_s, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps({
        "metric": "problem_size_scaling",
        "platform": jax.devices()[0].platform,
        "batch": args.batch,
        "backend": args.backend,
        "points": rows,
    }))


if __name__ == "__main__":
    main()
