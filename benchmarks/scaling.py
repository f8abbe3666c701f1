"""Scaling-efficiency sweep: solves/s at 1, 2, 4, ... N devices.

BASELINE.json configs[4]: 100k+ scenarios sharded across a mesh with
collective convergence reductions; report the solves/s scaling curve and
efficiency vs linear scaling.

On real multi-chip hardware this measures ICI-scaled throughput; on a single
host it runs on virtual devices (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the scaling
HARNESS (virtual CPU devices share cores, so efficiency numbers there are
not hardware-meaningful).

Usage:
    python benchmarks/scaling.py --per-device 512 --repeats 3
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import jax

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.parallel import mesh as meshlib
from irm_motion_planning_tpu.parallel import sharded


def measure(cfg, basis, n_devices, per_device, repeats, solver="bls",
            engine="fleet", backend="xla"):
    devices = jax.devices()[:n_devices]
    mesh = meshlib.make_mesh(devices)
    batch = per_device * n_devices
    scns = mp.replicate_scenario(mp.reference_scenario(cfg), batch)
    scns = meshlib.shard_batch(mesh, scns)
    run = sharded.make_shard_map_solver(
        cfg, basis, mesh, solver=solver, engine=engine, backend=backend
    )
    # Host fetch as the completion barrier: through the remote-TPU tunnel,
    # block_until_ready can return before pure-XLA loop programs finish
    # (see CLAUDE.md); the replicated psum stats are tiny to fetch.
    def run_to_completion():
        _, stats = run(scns)
        return float(stats["mean_final_cost"])

    run_to_completion()  # compile + warm-up
    times = []
    for _ in range(repeats):
        t0 = time.time()
        run_to_completion()
        times.append(time.time() - t0)
    best = min(times)
    return batch / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device", type=int, default=512)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--solver", choices=["bls", "gd"], default="bls")
    p.add_argument("--max-devices", type=int, default=0, help="0 = all")
    p.add_argument("--max-inner-iteration", type=int, default=200)
    p.add_argument("--max-outer-iteration", type=int, default=10)
    p.add_argument("--engine", choices=["fleet", "vmap"], default="fleet")
    p.add_argument("--backend", choices=["fused", "pallas", "xla"], default="xla")
    args = p.parse_args()

    cfg = mp.PlannerConfig(
        bls_mode="ladder",
        max_inner_iteration=args.max_inner_iteration,
        max_outer_iteration=args.max_outer_iteration,
    )
    basis = mp.make_basis(cfg)

    n_all = len(jax.devices())
    if args.max_devices:
        n_all = min(n_all, args.max_devices)
    counts = []
    n = 1
    while n <= n_all:
        counts.append(n)
        n *= 2
    if counts[-1] != n_all and n_all not in counts:
        counts.append(n_all)

    results = []
    base = None
    for n in counts:
        sps = measure(cfg, basis, n, args.per_device, args.repeats,
                      args.solver, args.engine, args.backend)
        if base is None:
            base = sps
        eff = sps / (base * n)
        results.append(
            {"devices": n, "solves_per_sec": round(sps, 1),
             "efficiency_vs_linear": round(eff, 3)}
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    print(json.dumps({
        "metric": "scaling_sweep",
        "platform": jax.devices()[0].platform,
        "per_device_batch": args.per_device,
        "points": results,
    }))


if __name__ == "__main__":
    main()
