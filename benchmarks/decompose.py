"""Decompose the fleet solve's wall time into its pipeline stages on the
current backend: layout transposes, the smoothstep init solve, the solver
kernel itself, and the output transpose.  Guides optimization — run on TPU.

Usage: python benchmarks/decompose.py [--batch 32768] [--backend fused]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.solvers import fleet


def timeit(fn, *args, repeats=5):
    import numpy as np

    def barrier(out):
        # Host fetch as the completion barrier: block_until_ready can return
        # before pure-XLA loop programs finish through the remote-TPU tunnel
        # (CLAUDE.md).
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))
        return out

    out = barrier(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        barrier(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--backend", choices=["fused", "pallas", "xla"],
                   default="fused")
    p.add_argument("--inner", type=int, default=15)
    args = p.parse_args()

    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True, max_inner_iteration=args.inner
    )
    basis = mp.make_basis(cfg)
    scns = mp.replicate_scenario(mp.reference_scenario(cfg), args.batch)

    to_fleet = jax.jit(fleet.to_fleet)
    t_layout, fs = timeit(to_fleet, scns)

    # basis passed as a traced argument, not a closure constant (CLAUDE.md:
    # constant-laden executables pay ~20 ms per dispatch through the tunnel).
    init = jax.jit(lambda b, f: fleet.fleet_init_alpha(cfg, b, f))
    t_init, a0 = timeit(init, basis, fs)

    solve_from_a0 = jax.jit(
        lambda b, f, a: fleet.fleet_solve(
            cfg, b, scns, alpha0=fleet.alpha_from_fleet(a),
            solver="bls", backend=args.backend,
        )
    )
    # NOTE: alpha_from_fleet then alpha_to_fleet inside — measures the
    # public path minus init.
    t_solve, _ = timeit(solve_from_a0, basis, fs, a0)

    full = fleet.make_fleet_solver(cfg, basis, backend=args.backend)
    t_full, _ = timeit(full, scns)

    print(json.dumps({
        "metric": "fleet_solve_decomposition",
        "batch": args.batch,
        "backend": args.backend,
        "layout_ms": round(t_layout * 1e3, 2),
        "init_ms": round(t_init * 1e3, 2),
        "solve_minus_init_ms": round(t_solve * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
