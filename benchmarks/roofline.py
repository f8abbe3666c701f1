"""Roofline / MFU quantification for the solver kernels on TPU v5e.

Counts the arithmetic of the fused cost/gradient/evaluation kernel — the
body every solver step executes — EXACTLY from the static config (per lane:
MXU FLOPs of the 2 basis GEMM groups, VPU FLOPs of the obstacle field, FK,
losses, chain rule; transcendentals separately), measures its wall time at
fleet batch, and reports achieved FLOP/s as a fraction of the chip peaks.

v5e peaks used (public numbers, jax-ml.github.io/scaling-book):
* MXU: 197 TFLOP/s bf16.  All solver dots run Precision.HIGHEST (6-pass
  bf16 decomposition for f32-exact results, required by the RKHS
  cancellation — CLAUDE.md), so the f32-HIGHEST effective ceiling is
  ~197/6 = 32.8 TFLOP/s and each algorithmic FLOP costs 6 hardware passes.
* VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz = 3.85 TFLOP/s f32.
* HBM: 819 GB/s.

Output: one JSON line with per-kernel achieved TFLOP/s, % of VPU peak,
% of MXU-HIGHEST peak, arithmetic intensity, and the solve-level step rate.

Usage: python benchmarks/roofline.py [--batch 32768]
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

VPU_PEAK = 3.85e12          # f32 FLOP/s
MXU_PEAK_BF16 = 197e12      # bf16 FLOP/s
HIGHEST_PASSES = 6          # f32 Precision.HIGHEST = 6 bf16 passes
MXU_PEAK_HIGHEST = MXU_PEAK_BF16 / HIGHEST_PASSES
HBM_BW = 819e9              # bytes/s


def count_cost_grad_eval(cfg) -> dict:
    """Per-lane arithmetic of ops/pallas_step.py::_Body.cost_grad_eval
    (forward_planes + cost_grad_from_traj), counted op-for-op against the
    kernel source.  MACs count as 2 FLOPs."""
    T, J = cfg.n_timesteps, cfg.n_joints
    O = cfg.max_obstacles

    # --- MXU: J forward dots kv(2T,T)@(T,1) + J pull-back dots
    # kvt(T,2T)@(2T,1) per lane -> 8*J*T^2 algorithmic FLOPs.
    mxu = 8 * J * T * T

    vpu = 0
    # forward mixing: J outputs x (J muls + (J-1) adds) over 2T rows
    vpu += 2 * T * J * (2 * J - 1)
    # fk_ee: cumsum (J-1)T adds, px/py 2JT muls, ee sums 2(J-1)T adds
    vpu += (J - 1) * T + 2 * J * T + 2 * (J - 1) * T
    transcendental = 2 * J * T          # sin+cos per (t, j)
    # obstacle field + factored gradient accumulators (per obstacle:
    # s: 5T, recip: T, winv: T, cost_v+=: T, coef: T, csum+=: T,
    # cox: 2T, coy: 2T = 14T), h: 3T, q: 3O, gx/gy: 4T
    vpu += 3 * T + 3 * O + O * 14 * T + 4 * T
    # blend weights: cmax T, first_max ~2T, wblend 2T, wgx/wgy 2T
    vpu += 7 * T
    # Jacobian suffix sums: 2*2*J*T adds + J*T negation
    vpu += 4 * J * T + J * T
    # scalar_cost: per joint ~10T (zp/pl_/zv/vl_/masks/sums) + toc 2T
    vpu += 10 * J * T + 2 * T
    # per-joint gradient assembly: ~22T per joint (toc_g 3T, sgp 4T, sgv 2T,
    # jp 5T, jv 3T, combines 5T)
    vpu += 22 * J * T
    # pull-back mixing: J outputs x (2J-1) over T rows
    vpu += T * J * (2 * J - 1)
    return {"mxu_flops": mxu, "vpu_flops": vpu,
            "transcendental": transcendental}


def barrier(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
    return x


def timeit(fn, *args, repeats=7):
    barrier(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        barrier(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--block-b", type=int, default=512)
    args = p.parse_args()

    cfg = mp.PlannerConfig(bls_mode="ladder", fixed_iters=True,
                           pallas_block_b=args.block_b)
    basis = mp.make_basis(cfg)
    B = args.batch
    scns = fleet.to_fleet(mp.replicate_scenario(mp.reference_scenario(cfg), B))
    a0 = jnp.moveaxis(fleet.fleet_init_alpha(cfg, basis, scns), 1, 0)
    ox, oy = scns.obstacles[:, 0, :], scns.obstacles[:, 1, :]
    lam = jnp.full((1, B), 0.5, jnp.float32)

    # K evals chained ON-DEVICE in one dispatch: per-dispatch tunnel latency
    # (~10-25 ms through the remote TPU) would otherwise dominate a single
    # ~1 ms kernel.  Each iteration feeds the produced gradient back in as
    # the next iterate (data dependence — nothing can be elided); the
    # returned scalar is the only host fetch.
    K = 64

    def many(kv, kvt, mix, a, l, st, gl, x, y, w):
        def step(_, a):
            out = pallas_step.cost_grad_eval(
                cfg, kv, kvt, mix, a, l, l, st, gl, x, y, w,
                block_b=args.block_b,
            )
            return out.grad * 1e-6   # rescale to keep iterates finite
        final = jax.lax.fori_loop(0, K, step, a)
        return jnp.sum(final)

    run_eval = jax.jit(many)
    t_eval = timeit(run_eval, basis.kv, basis.kv.T, basis.mix, a0, lam,
                    scns.start, scns.goal, ox, oy, scns.obstacle_weight) / K

    counts = count_cost_grad_eval(cfg)
    mxu_rate = counts["mxu_flops"] * B / t_eval
    vpu_rate = (counts["vpu_flops"] + counts["transcendental"]) * B / t_eval
    # The kernel runs MXU and VPU work serially within a step to first
    # order; utilization fractions are each stage's share of its own peak.
    mxu_frac = mxu_rate / MXU_PEAK_HIGHEST
    vpu_frac = vpu_rate / VPU_PEAK
    # HBM per eval: read alpha + write grad/traj/vel + loss (per-step kernel
    # path); the fused whole-solve kernel amortizes this to ~0.
    bytes_per_lane = 4 * (4 * cfg.n_joints * cfg.n_timesteps + 1)
    ai = (counts["mxu_flops"] + counts["vpu_flops"]) / bytes_per_lane

    # Solve-level: the headline fused solve at the benchmark schedule.
    sched = mp.REFERENCE_INNER_SCHEDULE_BLS
    cfg_s = mp.PlannerConfig(bls_mode="ladder", fixed_iters=True,
                             inner_schedule=sched,
                             max_inner_iteration=max(sched),
                             pallas_block_b=args.block_b)
    basis_s = mp.make_basis(cfg_s)
    scns_s = mp.replicate_scenario(mp.reference_scenario(cfg_s), B)
    run_solve = fleet.make_fleet_solver(cfg_s, basis_s, backend="fused")

    def solve_to_completion():
        out = run_solve(scns_s)
        float(jnp.sum(out.stats.final_cost))
        return out

    barrier_steps = int(np.asarray(solve_to_completion().stats.inner_iters)[0])
    t_solve = timeit(lambda: solve_to_completion())
    # Each live step ~= 1 fused eval + the ladder (>=1 rung cost eval) +
    # plane arithmetic; ~2x the bare eval is the measured shape.  Report the
    # per-step rate directly rather than stacking estimates.
    steps_per_sec = barrier_steps * B / t_solve

    # Counted-serial speed-of-light: MXU work at the HIGHEST ceiling + VPU
    # work at VPU peak, run back to back.  The gap to measured time is
    # transcendentals (each sincos is a multi-op VPU sequence), reciprocals,
    # and mask/select traffic not in the 1:1 FLOP count.
    sol_s = (counts["mxu_flops"] / MXU_PEAK_HIGHEST
             + counts["vpu_flops"] / VPU_PEAK) * B

    print(json.dumps({
        "metric": "roofline",
        "batch": B,
        "eval_kernel": {
            "time_us_per_call": round(t_eval * 1e6, 1),
            "counted_serial_speed_of_light_us": round(sol_s * 1e6, 1),
            "pct_of_counted_speed_of_light": round(100 * sol_s / t_eval, 1),
            "mxu_flops_per_lane": counts["mxu_flops"],
            "vpu_flops_per_lane": counts["vpu_flops"],
            "achieved_mxu_tflops": round(mxu_rate / 1e12, 2),
            "achieved_vpu_tflops": round(vpu_rate / 1e12, 2),
            "pct_of_mxu_highest_peak": round(100 * mxu_frac, 1),
            "pct_of_vpu_peak": round(100 * vpu_frac, 1),
            "arithmetic_intensity_flops_per_hbm_byte": round(ai, 1),
            "hbm_bound_ceiling_us": round(
                1e6 * bytes_per_lane * B / HBM_BW, 1),
        },
        "fused_solve": {
            "live_steps": barrier_steps,
            "steps_per_sec_millions": round(steps_per_sec / 1e6, 1),
            "time_ms": round(t_solve * 1e3, 1),
        },
        "peaks_assumed": {
            "vpu_f32_tflops": VPU_PEAK / 1e12,
            "mxu_bf16_tflops": MXU_PEAK_BF16 / 1e12,
            "highest_passes": HIGHEST_PASSES,
            "hbm_gb_s": HBM_BW / 1e9,
        },
    }))


if __name__ == "__main__":
    main()
