"""Heterogeneous-fleet (random-scene) compaction experiments.

Runs the per-round fused-kernel driver EAGERLY (one jitted fused_round
dispatch per penalty round, host bookkeeping between launches) so each
round's wall time, live-lane count, and live-tile count can be measured
separately — the decomposition that decides which compaction levers are
real (VERDICT r3 #3):

* ``policy=none``       — no re-sorting (the whole-solve kernel's tiling).
* ``policy=steps``      — one re-sort after round 0 by observed accepted
                          steps (the shipped cfg.lane_compaction policy).
* ``policy=steps_loss`` — same, with round-0 end loss as the tie-break
                          within equal step counts (loss-scale tile
                          homogeneity shortens the shared Armijo ladder —
                          the second, independent mechanism measured in
                          round 3's initial-loss presort).
* ``--shrink``          — additionally re-partition EVERY round and launch
                          the next round only over tiles with live lanes
                          (power-of-two bucketed batch to bound compiles).

Prints one JSON line per policy with throughput + per-round decomposition.
Usage: python benchmarks/hetero.py --batch 524288 --policies steps,steps_loss
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


def _barrier(x):
    np.asarray(jnp.sum(x))


@jax.jit
def _take(state, p):
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, p, axis=-1), state
    )


def run_policy(cfg, basis, fs, a0k, sched, block_b, policy, shrink,
               solver="bls", time_rounds=False):
    """One full dual solve, eager per-round dispatch.  Returns
    (elapsed_s, per_round dicts, final ful fraction)."""
    B = a0k.shape[-1]
    kv, kvt, mixm = basis.kv, basis.kv.T, basis.mix
    inc = jnp.float32(cfg.lambda_constraint_increase)

    state = dict(
        alpha=a0k,
        lam_sg=jnp.full((1, B), cfg.lambda_sg_constraint, jnp.float32),
        lam_jl=jnp.full((1, B), cfg.lambda_jl_constraint, jnp.float32),
        ful=jnp.zeros((1, B), jnp.float32),
        start=fs.start, goal=fs.goal,
        ox=fs.obstacles[:, 0, :], oy=fs.obstacles[:, 1, :],
        ow=fs.obstacle_weight,
    )
    floss = jnp.full((1, B), jnp.inf, jnp.float32)
    last_steps = jnp.zeros((B,), jnp.float32)
    tot_steps = jnp.zeros((B,), jnp.float32)
    rounds_info = []
    t_start = time.time()
    for r, n_r in enumerate(sched):
        t0 = time.time()
        if policy != "none" and r == 1:
            key = jnp.where(state["ful"][0] > 0.5, jnp.float32(jnp.inf),
                            last_steps)
            if policy == "steps_loss":
                lo = floss[0]
                lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
                t = (lo - lo.min()) / (lo.max() - lo.min() + 1e-9)
                key = key + jnp.clip(t, 0.0, 0.999)
            p = jnp.argsort(key)
            state = _take(state, p)
            floss = jnp.take(floss, p, axis=-1)
            last_steps = jnp.take(last_steps, p, axis=-1)
            tot_steps = jnp.take(tot_steps, p, axis=-1)
        if shrink and r >= 1:
            # dense-prefix partition of live lanes, EVERY round; bucket the
            # launched batch to a multiple of block_b (power-of-two-ish).
            ful_h = np.asarray(state["ful"][0])
            n_live = int((ful_h < 0.5).sum())
            p = jnp.argsort(state["ful"][0])  # stable: live lanes first
            state = _take(state, p)
            floss = jnp.take(floss, p, axis=-1)
            last_steps = jnp.take(last_steps, p, axis=-1)
            tot_steps = jnp.take(tot_steps, p, axis=-1)
            Br = max(block_b,
                     int(np.ceil(n_live / block_b)) * block_b)
        else:
            Br = B
        sub = {k: v[..., :Br] for k, v in state.items()} if Br < B else state
        t_sort = time.time() - t0
        lr0 = jnp.full((1, Br), cfg.bls_lr_start, jnp.float32)
        out = pallas_step.fused_round(
            cfg, kv, kvt, mixm, sub["alpha"], sub["lam_sg"], sub["lam_jl"],
            sub["ful"], lr0, n_r,
            sub["start"], sub["goal"], sub["ox"], sub["oy"], sub["ow"],
            solver=solver, block_b=block_b,
        )
        if time_rounds:
            _barrier(out.ok)
        t_round = time.time() - t0 - t_sort

        pad = B - Br
        ok = jnp.pad(out.ok, ((0, 0), (0, pad))) if pad else out.ok
        loss = jnp.pad(out.loss, ((0, 0), (0, pad))) if pad else out.loss
        inner = jnp.pad(out.inner, ((0, 0), (0, pad))) if pad else out.inner
        if pad:
            alpha = jnp.concatenate(
                [out.alpha, state["alpha"][..., Br:]], axis=-1)
        else:
            alpha = out.alpha
        was = state["ful"]
        now = jnp.maximum(was, ok)
        floss = jnp.where(was > 0.5, floss, loss)
        state["lam_sg"] = jnp.where(now > 0.5, state["lam_sg"],
                                    state["lam_sg"] * inc)
        state["lam_jl"] = jnp.where(now > 0.5, state["lam_jl"],
                                    state["lam_jl"] * inc)
        state["ful"] = now
        state["alpha"] = alpha
        last_steps = inner[0]
        tot_steps = tot_steps + inner[0]
        if time_rounds:
            ful_h = np.asarray(now[0])
            ntile = ful_h.reshape(-1, block_b)
            rounds_info.append({
                "r": r, "n_r": int(n_r), "launched": int(Br),
                "t_sort_ms": round(1e3 * t_sort, 1),
                "t_round_ms": round(1e3 * t_round, 1),
                "ful_frac": round(float(ful_h.mean()), 4),
                "live_tiles": int((ntile.min(axis=1) < 0.5).sum()),
                "tiles": ntile.shape[0],
            })
    _barrier(state["ful"])
    elapsed = time.time() - t_start
    return (elapsed, rounds_info, float(np.asarray(state["ful"]).mean()),
            tot_steps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=524288)
    p.add_argument("--block-b", type=int, default=512)
    p.add_argument("--policies", default="none,steps,steps_loss")
    p.add_argument("--shrink", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--rounds-detail", action="store_true",
                   help="per-round timing decomposition (adds a barrier per "
                        "round — slightly lowers end-to-end throughput)")
    args = p.parse_args()

    sched = mp.REFERENCE_INNER_SCHEDULE_BLS
    cfg = mp.PlannerConfig(
        bls_mode="ladder", fixed_iters=True, inner_schedule=sched,
        max_inner_iteration=max(sched), max_obstacles=11,
        pallas_block_b=args.block_b,
    )
    basis = mp.make_basis(cfg)
    scns = mp.random_scenarios(cfg, jax.random.PRNGKey(args.seed), args.batch)
    fs = fleet.to_fleet(scns)
    a0k = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, fs), 1, 0)
    _barrier(a0k)

    for policy in args.policies.split(","):
        # ``oracle``: presort the INITIAL fleet by the final per-lane TOTAL
        # accepted-step counts from an untimed discovery run (policy=none),
        # then time policy=none on the presorted fleet — the upper bound
        # any causal between-round compaction policy can approach.
        run_fs, run_a0k = fs, a0k
        run_pol = policy
        if policy == "oracle":
            # Discovery runs with shrink=False ALWAYS: the shrink path
            # permutes lanes every round, so its returned tot_steps would be
            # in the final permuted order while fs/a0k stay in the original
            # order — argsort over it would scramble the presort and silently
            # understate the oracle bound.  Per-lane total work is identical
            # with or without shrink, so the restriction costs nothing.
            _, _, _, tot = run_policy(cfg, basis, fs, a0k, sched,
                                      args.block_b, "none", shrink=False)
            perm = jnp.argsort(tot)
            run_fs = jax.tree_util.tree_map(
                lambda x: jnp.take(x, perm, axis=-1)
                if x.ndim and x.shape[-1] == args.batch else x, fs)
            run_a0k = jnp.take(a0k, perm, axis=-1)
            _barrier(run_a0k)
            run_pol = "none"
        # warm-up (compiles)
        run_policy(cfg, basis, run_fs, run_a0k, sched, args.block_b,
                   run_pol, args.shrink)
        best, info = None, None
        for _ in range(args.repeats):
            el, ri, ful, _ = run_policy(
                cfg, basis, run_fs, run_a0k, sched, args.block_b, run_pol,
                args.shrink, time_rounds=args.rounds_detail)
            if best is None or el < best:
                best, info = el, ri
        row = {
            "policy": policy, "shrink": bool(args.shrink),
            "batch": args.batch, "block_b": args.block_b,
            "solves_per_sec": round(args.batch / best, 1),
            "ful_frac": round(ful, 4),
        }
        print(json.dumps(row))
        if args.rounds_detail:
            for ri_row in info:
                print(json.dumps(ri_row), file=sys.stderr)


if __name__ == "__main__":
    main()
