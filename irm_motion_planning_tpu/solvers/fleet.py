"""Fleet solver: the MXU-shaped batched engine.

``solvers/batched.py`` (vmap) is semantically clean but maps the basis
contraction to B independent (2T, T) x (T, J) GEMMs with N=3 output columns —
2% utilization of the 128x128 systolic array.  This module re-lays the whole
solve out **batch-trailing**: every tensor carries the scenario lane as its
LAST axis,

    alpha       (T, J, B)
    trajectory  (T, J, B)
    EE points   (2, T, B)
    obstacles   (O, 2, B)
    lane state  (B,)

so the hot contraction becomes ONE GEMM, ``kv (2T, T) @ alpha (T, J*B)``,
with thousands of output columns (B=4096 -> N=12288), and every elementwise
op runs with the lane axis on the VPU's 128-wide lanes.  The line-search
ladder adds a trailing candidate axis, folding all Armijo trials of all lanes
into a single (2T, T) x (T, J*B*n) GEMM per inner step.

Semantics are the ladder-BLS / GD semantics of solvers/bls.py / gd.py, lane
exact (per-lane penalties, per-lane freeze masks); results match the vmap
engine to fp-path tolerance (see tests/test_fleet.py).

Reference capability this accelerates: the per-solve optimizer loop
(ref: optimizer_BLS.py:126-213, optimizer_GD.py:172-232) at fleet scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PlannerConfig
from ..models import robot
from ..models.rkhs import Basis, _precision
from ..ops.costs import Penalty
from ..ops.scenario import Scenario
from .common import (
    SolveResult, SolveStats, freeze_when, inner_loop_bound, run_dual_loop,
)


# ---------------------------------------------------------------------------
# Layout transforms: leading-batch (API) <-> trailing-batch (device layout).
# ---------------------------------------------------------------------------


def to_fleet(scns: Scenario) -> Scenario:
    """(B, ...) leaves -> (..., B) leaves."""
    return Scenario(
        start=jnp.moveaxis(scns.start, 0, -1),            # (J, B)
        goal=jnp.moveaxis(scns.goal, 0, -1),              # (J, B)
        obstacles=jnp.moveaxis(scns.obstacles, 0, -1),    # (O, 2, B)
        obstacle_weight=jnp.moveaxis(scns.obstacle_weight, 0, -1),  # (O, B)
    )


def alpha_to_fleet(alpha: jnp.ndarray) -> jnp.ndarray:
    """(B, T, J) -> (T, J, B)."""
    return jnp.moveaxis(alpha, 0, -1)


def alpha_from_fleet(alpha: jnp.ndarray) -> jnp.ndarray:
    """(T, J, B) -> (B, T, J)."""
    return jnp.moveaxis(alpha, -1, 0)


# ---------------------------------------------------------------------------
# Batch-trailing math.
# ---------------------------------------------------------------------------


def fleet_evaluate(cfg, basis: Basis, alpha: jnp.ndarray):
    """alpha (T, J, ...L) -> (traj, vel) each (T, J, ...L) via one stacked
    GEMM.  Trailing lane axes ...L are (B,) or (B, n) for ladder candidates."""
    T, J = alpha.shape[:2]
    lanes = alpha.shape[2:]
    prec = _precision(cfg)
    both = jnp.matmul(
        basis.kv, alpha.reshape(T, -1), precision=prec
    ).reshape((2, T, J) + lanes)
    # mix over the joint axis: out[t, i, ...] = sum_j val[t, j, ...] * mix[j, i]
    both = jnp.einsum("ktj...,ji->kti...", both, basis.mix, precision=prec)
    return both[0], both[1]


def fleet_init_alpha(cfg, basis: Basis, scn: Scenario) -> jnp.ndarray:
    """Smoothstep warm start for every lane (ref: trajectory.py:73-78).

    The fitted system is ``km @ alpha = line @ mix_inv`` with
    ``line = 1 (x) start + c (x) (goal - start)`` — rank 2 along the time
    axis — so with ``init_u = km^-1 1`` and ``init_w = km^-1 c`` factored at
    basis build, the whole-fleet init is two outer products (pure VPU, no
    per-solve linear solve; was ~13% of fleet wall time as a batched LU)."""
    prec = _precision(cfg)
    sm = jnp.einsum("jb,ji->ib", scn.start, basis.mix_inv, precision=prec)
    dm = jnp.einsum(
        "jb,ji->ib", scn.goal - scn.start, basis.mix_inv, precision=prec
    )
    return (
        basis.init_u[:, None, None] * sm[None]
        + basis.init_w[:, None, None] * dm[None]
    )


def _fk_ee(cfg, traj):
    """traj (T, J, ...L) -> EE (2, T, ...L)."""
    c = jnp.cumsum(traj, axis=1)
    ll = robot.link_lengths(cfg)
    return jnp.stack(
        (
            jnp.einsum("tj...,j->t...", jnp.cos(c), ll),
            jnp.einsum("tj...,j->t...", jnp.sin(c), ll),
        )
    )


def _fk_ee_and_jac(cfg, traj):
    """traj (T, J, B) -> (EE (2, T, B), jac (2, T, J, B))."""
    c = jnp.cumsum(traj, axis=1)
    ll = robot.link_lengths(cfg)[None, :, None]
    sin, cos = jnp.sin(c), jnp.cos(c)
    ee = jnp.stack(((cos * ll).sum(1), (sin * ll).sum(1)))
    x = -ll * sin
    y = ll * cos
    rcx = x + x.sum(1, keepdims=True) - jnp.cumsum(x, axis=1)
    rcy = y + y.sum(1, keepdims=True) - jnp.cumsum(y, axis=1)
    return ee, jnp.stack((rcx, rcy))


def _obstacle_v(ee, obstacles, weight):
    """ee (2, T, ...L), obstacles (O, 2, B), weight (O, B).  Lane axes ...L
    are (B,) or — for ladder candidates — (n, B): the rung axis sits BEFORE
    the batch axis so B stays on the minor (128-lane) dimension of every
    elementwise op.  Returns cost_v (T, ...L)."""
    extra = ee.ndim - 3  # candidate axes inserted before B
    O, B = weight.shape
    obs = jnp.moveaxis(obstacles, 1, 0).reshape(
        (2, 1, O) + (1,) * extra + (B,)
    )  # (2, 1, O, 1..., B)
    w = weight.reshape((1, O) + (1,) * extra + (B,))
    diff = ee[:, :, None] - obs                      # (2, T, O, ...L)
    d2 = jnp.sum(jnp.square(diff), axis=0)           # (T, O, ...L)
    return jnp.sum(0.8 / (0.5 + 0.5 * d2) * w, axis=1)


def _obstacle_vg(ee, obstacles, weight):
    """Value + gradient w.r.t. ee.  ee (2, T, B) -> ((T, B), (2, T, B))."""
    obs = jnp.moveaxis(obstacles, 1, 0)[:, None]     # (2, 1, O, B)
    diff = ee[:, :, None] - obs                      # (2, T, O, B)
    d2 = jnp.sum(jnp.square(diff), axis=0)
    inv = 1.0 / (0.5 + 0.5 * d2)
    cost_v = jnp.sum(0.8 * inv * weight[None], axis=1)
    cost_g = jnp.sum((-0.8 * weight[None, None]) * diff * jnp.square(inv)[None], axis=2)
    return cost_v, cost_g


def _blend(cfg, cost_v):
    """cost_v (T, ...L) -> blended cost (...L,) (max/avg mix,
    ref: trajectory.py:85-87)."""
    lam = cfg.lambda_max_cost
    return lam * jnp.max(cost_v, axis=0) + (1.0 - lam) * jnp.mean(cost_v, axis=0)


def _blend_weights(cfg, cost_v):
    """Gradient weights of the blend: (T, B)."""
    T = cost_v.shape[0]
    lam = cfg.lambda_max_cost
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, cost_v.shape, 0)
        == jnp.argmax(cost_v, axis=0)[None]
    ).astype(cost_v.dtype)
    return lam * onehot + (1.0 - lam) / T


def _limit_terms(cfg, traj, vel):
    """Joint position/velocity limit losses (B,) (ref: trajectory.py:215-268)."""
    mean = 0.5 * (cfg.max_joint_position + cfg.min_joint_position)
    std = 0.5 * (cfg.max_joint_position - mean)
    pl = 0.5 * jnp.square((traj - mean) / std)
    vl = 0.5 * jnp.square(vel / cfg.max_joint_velocity)
    if cfg.constraint_violating_dependant_loss:
        pmask = jnp.logical_or(
            traj > cfg.joint_safety_limit * cfg.max_joint_position,
            traj < cfg.joint_safety_limit * cfg.min_joint_position,
        )
        vmask = jnp.abs(vel) > cfg.joint_safety_limit * cfg.max_joint_velocity
        pl = jnp.where(pmask, pl, 0.0)
        vl = jnp.where(vmask, vl, 0.0)
    T = traj.shape[0]
    return pl.sum(axis=(0, 1)) / T, vl.sum(axis=(0, 1)) / T


def _limit_grads(cfg, traj, vel):
    mean = 0.5 * (cfg.max_joint_position + cfg.min_joint_position)
    std = 0.5 * (cfg.max_joint_position - mean)
    pg = (traj - mean) / (std * std)
    vg = vel / (cfg.max_joint_velocity**2)
    if cfg.constraint_violating_dependant_loss:
        pmask = jnp.logical_or(
            traj > cfg.joint_safety_limit * cfg.max_joint_position,
            traj < cfg.joint_safety_limit * cfg.min_joint_position,
        )
        vmask = jnp.abs(vel) > cfg.joint_safety_limit * cfg.max_joint_velocity
        pg = jnp.where(pmask, pg, 0.0)
        vg = jnp.where(vmask, vg, 0.0)
    T = traj.shape[0]
    return pg / T, vg / T


def fleet_cost_from_traj(cfg, scn: Scenario, penalty: Penalty, traj, vel) -> jnp.ndarray:
    """Total penalized cost per lane given an already-evaluated trajectory.

    Split out from :func:`fleet_cost` because RKHS evaluation is LINEAR in
    alpha: line-search candidates' trajectories are affine combinations of
    two precomputed evaluations, so the ladder never re-runs the basis GEMM
    (see _make_bls_inner)."""
    ee = _fk_ee(cfg, traj)
    toc = _blend(cfg, _obstacle_v(ee, scn.obstacles, scn.obstacle_weight))
    extra = traj.ndim - 3  # rung axes inserted before B
    J, B = scn.start.shape
    start = scn.start.reshape((J,) + (1,) * extra + (B,))
    goal = scn.goal.reshape((J,) + (1,) * extra + (B,))
    sgpc = 0.5 * (
        jnp.sum(jnp.square(traj[0] - start), axis=0)
        + jnp.sum(jnp.square(traj[-1] - goal), axis=0)
    )
    sgvc = 0.5 * (
        jnp.sum(jnp.square(vel[0]), axis=0) + jnp.sum(jnp.square(vel[-1]), axis=0)
    )
    jpc, jvc = _limit_terms(cfg, traj, vel)
    # penalty fields are (B,); they broadcast over the leading rung axes.
    return toc + penalty.lambda_sg * (sgpc + sgvc) + penalty.lambda_jl * (jpc + jvc)


def fleet_cost(cfg, basis, scn: Scenario, penalty: Penalty, alpha) -> jnp.ndarray:
    """Total penalized cost per lane.  alpha (T, J, ...L) -> (...L,)."""
    traj, vel = fleet_evaluate(cfg, basis, alpha)
    return fleet_cost_from_traj(cfg, scn, penalty, traj, vel)


def fleet_cost_grad_eval(cfg, basis, scn, penalty: Penalty, alpha):
    """Fused per-lane cost + analytical alpha-gradient + the evaluated
    (traj, vel), so callers can reuse the basis evaluation (the line-search
    linearization needs it).  alpha (T, J, B) ->
    ((B,), (T, J, B), (T, J, B), (T, J, B))."""
    prec = _precision(cfg)
    traj, vel = fleet_evaluate(cfg, basis, alpha)
    ee, jac = _fk_ee_and_jac(cfg, traj)
    cost_v, cost_g = _obstacle_vg(ee, scn.obstacles, scn.obstacle_weight)
    toc = _blend(cfg, cost_v)
    w = _blend_weights(cfg, cost_v)                          # (T, B)
    toc_g = jnp.einsum("itb,itjb->tjb", w[None] * cost_g, jac)

    sgpc = 0.5 * (
        jnp.sum(jnp.square(traj[0] - scn.start), axis=0)
        + jnp.sum(jnp.square(traj[-1] - scn.goal), axis=0)
    )
    sgvc = 0.5 * (
        jnp.sum(jnp.square(vel[0]), axis=0) + jnp.sum(jnp.square(vel[-1]), axis=0)
    )
    jpc, jvc = _limit_terms(cfg, traj, vel)
    cost = toc + penalty.lambda_sg * (sgpc + sgvc) + penalty.lambda_jl * (jpc + jvc)

    sgp_g = jnp.zeros_like(traj).at[0].set(traj[0] - scn.start)
    sgp_g = sgp_g.at[-1].set(traj[-1] - scn.goal)
    sgv_g = jnp.zeros_like(vel).at[0].set(vel[0]).at[-1].set(vel[-1])
    jp_g, jv_g = _limit_grads(cfg, traj, vel)

    grad_pos = toc_g + penalty.lambda_sg * sgp_g + penalty.lambda_jl * jp_g
    grad_vel = penalty.lambda_sg * sgv_g + penalty.lambda_jl * jv_g
    stacked = jnp.concatenate((grad_pos, grad_vel), axis=0)   # (2T, J, B)
    T, J, B = alpha.shape
    pulled = jnp.matmul(
        basis.kv.T, stacked.reshape(2 * T, J * B), precision=prec
    ).reshape(T, J, B)
    grad = jnp.einsum("tib,ji->tjb", pulled, basis.mix, precision=prec)
    return cost, grad, traj, vel


def fleet_cost_and_grad(cfg, basis, scn, penalty: Penalty, alpha):
    """Fused per-lane cost + analytical alpha-gradient.
    alpha (T, J, B) -> ((B,), (T, J, B))."""
    cost, grad, _, _ = fleet_cost_grad_eval(cfg, basis, scn, penalty, alpha)
    return cost, grad


def fleet_constraints(cfg, basis, scn: Scenario, alpha) -> jnp.ndarray:
    """Per-lane hard-constraint check (B,) (ref: trajectory.py:129-137)."""
    traj, vel = fleet_evaluate(cfg, basis, alpha)
    pos_ok = jnp.logical_and(
        jnp.linalg.norm(traj[0] - scn.start, axis=0) < cfg.eps_position,
        jnp.linalg.norm(traj[-1] - scn.goal, axis=0) < cfg.eps_position,
    )
    vel_ok = jnp.logical_and(
        jnp.linalg.norm(vel[0], axis=0) < cfg.eps_velocity,
        jnp.linalg.norm(vel[-1], axis=0) < cfg.eps_velocity,
    )
    box_ok = jnp.logical_and(
        traj.max(axis=(0, 1)) <= cfg.max_joint_position,
        traj.min(axis=(0, 1)) >= cfg.min_joint_position,
    )
    vbox_ok = jnp.abs(vel).max(axis=(0, 1)) <= cfg.max_joint_velocity
    return pos_ok & vel_ok & box_ok & vbox_ok


# ---------------------------------------------------------------------------
# Inner loops (lane-parallel).
# ---------------------------------------------------------------------------


class _BlsInner(NamedTuple):
    minimized: jnp.ndarray   # (B,)
    inner_iter: jnp.ndarray  # (B,)
    alpha: jnp.ndarray       # (T, J, B)
    bls_lr: jnp.ndarray      # (B,)
    loss: jnp.ndarray        # (B,)
    grad: jnp.ndarray        # (T, J, B)
    traj: jnp.ndarray        # (T, J, B) — evaluation at alpha (reused by ladder)
    vel: jnp.ndarray         # (T, J, B)


def _make_bls_inner(cfg: PlannerConfig, basis, scn: Scenario):
    tol = jnp.float32(cfg.loop_loss_reduction)
    n = cfg.max_bls_iteration
    rungs = jnp.power(
        jnp.float32(cfg.bls_beta_minus), jnp.arange(n, dtype=jnp.float32)
    )  # (n,)

    def for_outer(outer_iter, round_idx=None):
        del outer_iter
        bound = inner_loop_bound(cfg, round_idx)

        def inner(alpha, penalty: Penalty):
            loss0, grad0, traj0, vel0 = fleet_cost_grad_eval(
                cfg, basis, scn, penalty, alpha
            )
            B = loss0.shape[0]

            def _raw_body(s: _BlsInner) -> _BlsInner:
                gnorm = jnp.sqrt(jnp.sum(jnp.square(s.grad), axis=(0, 1)))  # (B,)
                n_grad = s.grad / gnorm
                # reference quirk (optimizer_BLS.py:86): sum over ALL (J, J)
                # entries of grad^T @ n_grad; factorizes as
                # sum_t rowsum(grad)_t * rowsum(n_grad)_t.
                alpha_norm = jnp.sum(
                    jnp.sum(s.grad, axis=1) * jnp.sum(n_grad, axis=1), axis=0
                )  # (B,)
                # Rung-major candidates (T, J, n+1, B): the batch stays on
                # the minor axis so every elementwise op runs full-width
                # lanes.  Rung n is the ZERO-lr candidate — alpha itself,
                # bitwise — evaluated through the SAME batched path as the
                # real rungs; its loss is the Armijo/stop BASELINE.  The
                # ill-conditioned parametrization amplifies batched-vs-
                # unbatched fp-path differences on the same point to ~1e-4
                # relative, above the margin of small-lr rungs and the 1e-3
                # stop threshold, so a cross-path baseline (the carried
                # s.loss from fleet_cost_grad_eval) systematically flips
                # near-threshold accepts/stops: measured on 256 random
                # scenes (early-exit, reference budgets, exact tier) the
                # cross-path ladder converged 77% of lanes vs the
                # sequential reference's 53%; the same-path baseline
                # restores the reference's distribution
                # (benchmarks/certify.py).
                lrs = rungs[:, None] * s.bls_lr[None]            # (n, B)
                lrs_b = jnp.concatenate(
                    [lrs, jnp.zeros((1,) + lrs.shape[1:], lrs.dtype)], axis=0
                )                                                # (n+1, B)
                a_fac = 1.0 - cfg.lambda_reg * lrs_b             # (n+1, B)
                if cfg.ladder_eval == "linearized":
                    # LINEARIZATION: evaluation is linear in alpha, so every
                    # rung's trajectory is an affine combination of the
                    # CURRENT evaluation (carried in the state) and ONE
                    # evaluation of the search direction — no per-candidate
                    # basis GEMM.  Exact in real arithmetic; see
                    # config.ladder_eval for the measured fp-path trade.
                    gtraj, gvel = fleet_evaluate(cfg, basis, n_grad)
                    cand_traj = (a_fac * s.traj[:, :, None]
                                 - lrs_b * gtraj[:, :, None])
                    cand_vel = (a_fac * s.vel[:, :, None]
                                - lrs_b * gvel[:, :, None])
                else:
                    # EXACT: each rung's candidate alpha through the basis
                    # GEMMs, like the reference (ref: optimizer_BLS.py:139).
                    cand_alpha = (
                        a_fac[None, None] * s.alpha[:, :, None]
                        - lrs_b[None, None] * n_grad[:, :, None]
                    )                                            # (T,J,n+1,B)
                    cand_traj, cand_vel = fleet_evaluate(cfg, basis, cand_alpha)
                cand_loss = fleet_cost_from_traj(
                    cfg, scn, penalty, cand_traj, cand_vel
                )                                                # (n+1, B)
                base_loss = cand_loss[n]                         # (B,)
                required = (base_loss[None]
                            - cfg.bls_alpha * lrs * alpha_norm[None])
                ok = cand_loss[:n] <= required
                any_ok = jnp.any(ok, axis=0)                     # (B,)
                j = jnp.argmax(ok, axis=0)                       # (B,)
                lr_sel = jnp.take_along_axis(lrs, j[None], axis=0)[0]
                lr_eff = jnp.where(any_ok, lr_sel, 0.0)          # rejected -> no step
                new_alpha = (1.0 - cfg.lambda_reg * lr_eff) * s.alpha - lr_eff * n_grad
                sel_loss = jnp.take_along_axis(cand_loss[:n], j[None], axis=0)[0]
                new_loss = jnp.where(any_ok, sel_loss, base_loss)
                new_lr = jnp.where(
                    any_ok,
                    lr_sel * cfg.bls_beta_plus,
                    s.bls_lr * jnp.float32(cfg.bls_beta_minus) ** n,
                )
                stop = base_loss - new_loss < tol
                next_loss, next_grad, next_traj, next_vel = fleet_cost_grad_eval(
                    cfg, basis, scn, penalty, new_alpha
                )
                return _BlsInner(
                    minimized=stop,
                    inner_iter=jnp.where(stop, s.inner_iter, s.inner_iter + 1),
                    alpha=new_alpha,
                    bls_lr=new_lr,
                    loss=jnp.where(stop, new_loss, next_loss),
                    grad=jnp.where(stop, s.grad, next_grad),
                    traj=next_traj,
                    vel=next_vel,
                )

            def body(s: _BlsInner) -> _BlsInner:
                # Freeze minimized AND budget-exhausted lanes: the batched
                # early-exit while_loop keeps running while any lane is
                # active, and without the exhaustion term a capped lane
                # would take extra steps it never gets alone (see
                # common.py::run_dual_loop's outer freeze).
                done = jnp.logical_or(
                    s.minimized, s.inner_iter >= cfg.max_inner_iteration
                )
                return freeze_when(done, s, _raw_body(s))

            init = _BlsInner(
                minimized=jnp.zeros(B, bool),
                inner_iter=jnp.zeros(B, jnp.int32),
                alpha=alpha,
                bls_lr=jnp.full((B,), cfg.bls_lr_start, jnp.float32),
                loss=loss0,
                grad=grad0,
                traj=traj0,
                vel=vel0,
            )
            if cfg.fixed_iters:
                final = jax.lax.fori_loop(
                    0, bound, lambda _, s: body(s), init
                )
            else:
                final = jax.lax.while_loop(
                    lambda s: jnp.any(
                        jnp.logical_and(
                            s.inner_iter < cfg.max_inner_iteration,
                            jnp.logical_not(s.minimized),
                        )
                    ),
                    body,
                    init,
                )
            return final.alpha, final.inner_iter, final.loss

        return inner

    return for_outer


def _planes_constraints(cfg: PlannerConfig, scn: Scenario, traj, vel):
    """Per-lane hard-constraint check from kernel-layout (J, T, B) planes."""
    d0 = traj[:, 0, :] - scn.start          # (J, B)
    dN = traj[:, -1, :] - scn.goal
    pos_ok = jnp.logical_and(
        jnp.linalg.norm(d0, axis=0) < cfg.eps_position,
        jnp.linalg.norm(dN, axis=0) < cfg.eps_position,
    )
    vel_ok = jnp.logical_and(
        jnp.linalg.norm(vel[:, 0, :], axis=0) < cfg.eps_velocity,
        jnp.linalg.norm(vel[:, -1, :], axis=0) < cfg.eps_velocity,
    )
    box_ok = jnp.logical_and(
        traj.max(axis=(0, 1)) <= cfg.max_joint_position,
        traj.min(axis=(0, 1)) >= cfg.min_joint_position,
    )
    vbox_ok = jnp.abs(vel).max(axis=(0, 1)) <= cfg.max_joint_velocity
    return pos_ok & vel_ok & box_ok & vbox_ok


class _PallasOuter(NamedTuple):
    fulfilled: jnp.ndarray    # (B,)
    outer_iter: jnp.ndarray   # (B,) i32
    alpha: jnp.ndarray        # (J, T, B)
    lam_sg: jnp.ndarray       # (B,)
    lam_jl: jnp.ndarray       # (B,)
    total_inner: jnp.ndarray  # (B,) i32
    final_loss: jnp.ndarray   # (B,)


def _pallas_fused_solve(
    cfg: PlannerConfig, basis, scn: Scenario, a0, block_b: int,
    solver: str = "bls", stream_rb: int = 0, interpret: bool = False,
    lean: bool = False, ultra: bool = False, bf16: bool = False,
) -> SolveResult:
    """The whole dual solve as ONE VMEM-resident kernel launch (see
    ops/pallas_step.py::fused_solve): no per-step HBM state round-trips, no
    per-step launch overhead.  State layout (J, T, B) end to end."""
    from ..ops import pallas_step

    B = a0.shape[-1]
    out = pallas_step.fused_solve(
        cfg, basis.kv, basis.kv.T, basis.mix, a0,
        jnp.full((1, B), cfg.lambda_sg_constraint, jnp.float32),
        jnp.full((1, B), cfg.lambda_jl_constraint, jnp.float32),
        scn.start, scn.goal,
        scn.obstacles[:, 0, :], scn.obstacles[:, 1, :], scn.obstacle_weight,
        solver=solver, block_b=block_b, stream_rb=stream_rb,
        interpret=interpret, lean=lean, ultra=ultra, bf16=bf16,
    )
    return SolveResult(
        alpha=alpha_from_fleet(jnp.moveaxis(out.alpha, 0, 1)),
        stats=SolveStats(
            outer_iters=out.outer_iters[0].astype(jnp.int32),
            inner_iters=out.inner_iters[0].astype(jnp.int32),
            converged=out.fulfilled[0] > 0.5,
            final_cost=out.final_loss[0],
        ),
    )


def _pallas_fused_rounds_solve(
    cfg: PlannerConfig, basis, scn: Scenario, a0, block_b: int,
    solver: str = "bls", stream_rb: int = 0, interpret: bool = False,
    compact: Optional[bool] = None, lean: bool = False,
    ultra: bool = False, bf16: bool = False,
) -> SolveResult:
    """The dual solve as one fused-round kernel launch per penalty round
    (ops/pallas_step.py::fused_round), with optional between-round LANE
    COMPACTION for heterogeneous fleets.

    Why: a kernel tile stays live until its SLOWEST lane freezes, so on
    mixed workloads (random scenarios) scattered slow lanes pin every tile
    live and the whole-tile freeze-skip that makes the replicated-scene
    headline fast buys nothing (measured: 296k solves/s replicated vs 89k
    random at 512k lanes).  Sorting lanes by the FIRST round's observed
    accepted-step count (fulfilled lanes last) groups fast lanes into tiles
    that freeze together and fulfilled lanes into tiles that skip their
    remaining rounds wholesale.

    Policy — resort ONCE, after round 0 (all measured on v5e, 512k random
    scenes, the bench schedule): lane permutation on TPU is expensive (an
    isolated 512k-index gather on (J,T,B) takes seconds; even as-lowered
    inside this program one sort+permute costs ~100 ms), while the sort
    key barely improves with repetition — resort-every-round 76.5k
    solves/s, after rounds 0+1+2 88.7k, after rounds 0+3 94.6k, after
    round 0 only 94.8k vs 89.2k unsorted; an oracle presort by the final
    per-lane step counts bounds the ceiling at 100.5k.  Round 0 carries
    the signal: it has the largest budget, and its observed step count
    predicts a lane's later behavior better than any cheap a-priori key
    (initial-loss host presort: 94.5k, corr(init_loss, steps) = 0.09 — its
    gain comes from loss-scale tile homogeneity shortening the shared
    Armijo ladder, a second, independent mechanism).

    Correctness: per-lane results are BITWISE invariant under lane
    permutation — every kernel op along the lane axis is elementwise,
    reductions run along T only, and tile membership affects only whether
    already-frozen lanes ride a skipped round/step (an identity
    pass-through either way).  tests/test_fleet_fused.py pins this against
    backend='fused' exactly.  The state is gathered/unsorted in XLA between
    launches; alpha is the only large leaf, so the extra HBM traffic is
    ~2 r/w of the iterate per round — negligible next to the round's
    compute at any interesting batch."""
    from ..ops import pallas_step

    if compact is None:
        compact = cfg.lane_compaction
    B = a0.shape[-1]
    kv, kvt, mixm = basis.kv, basis.kv.T, basis.mix
    start, goal = scn.start, scn.goal
    ox = scn.obstacles[:, 0, :]
    oy = scn.obstacles[:, 1, :]
    ow = scn.obstacle_weight
    inc = jnp.float32(cfg.lambda_constraint_increase)
    sched = [float(x) for x in cfg.gd_lr]
    inner_sched = (
        [int(x) for x in cfg.inner_schedule]
        if (cfg.inner_schedule is not None and cfg.fixed_iters) else None
    )

    alpha = a0
    lam_sg = jnp.full((1, B), cfg.lambda_sg_constraint, jnp.float32)
    lam_jl = jnp.full((1, B), cfg.lambda_jl_constraint, jnp.float32)
    ful = jnp.zeros((1, B), jnp.float32)
    outer = jnp.zeros((1, B), jnp.float32)
    total_inner = jnp.zeros((1, B), jnp.float32)
    floss = jnp.full((1, B), jnp.inf, jnp.float32)
    perm = jnp.arange(B, dtype=jnp.int32)  # lane i holds original lane perm[i]
    last_steps = jnp.zeros((B,), jnp.float32)

    def take(x, p):
        return jnp.take(x, p, axis=-1)

    for r in range(cfg.max_outer_iteration):
        if compact and r == 1:
            # Sort key: round 0's observed accepted steps (a lane that froze
            # fast tends to freeze fast again); fulfilled lanes to the back
            # so they pack into whole tiles that skip rounds entirely.
            # Round-0 end loss breaks ties WITHIN equal step counts (a
            # [0, 1)-scaled addend on integer-valued steps = lexicographic):
            # loss-scale tile homogeneity shortens the shared Armijo ladder
            # — the second, independent mechanism from round 3's
            # initial-loss presort.  Measured v5e, 512k random scenes:
            # steps-only 99.0k, steps+loss tie-break 100.6k solves/s —
            # past round 3's oracle-presort bound for the steps-only
            # mechanism (100.5k).  ONE resort only — policy table in the
            # docstring / REPORT §9.
            lo = jnp.where(jnp.isfinite(floss[0]), floss[0], 0.0)
            tie = (lo - lo.min()) / (lo.max() - lo.min() + 1e-9)
            key = jnp.where(
                ful[0] > 0.5, jnp.float32(jnp.inf),
                last_steps + jnp.clip(tie, 0.0, 0.999),
            )
            p = jnp.argsort(key)
            (alpha, lam_sg, lam_jl, ful, outer, total_inner, floss,
             start, goal, ox, oy, ow, perm, last_steps) = (
                take(x, p) for x in (
                    alpha, lam_sg, lam_jl, ful, outer, total_inner, floss,
                    start, goal, ox, oy, ow, perm, last_steps,
                )
            )
        lr0 = jnp.full(
            (1, B),
            cfg.bls_lr_start if solver == "bls"
            else sched[min(r, len(sched) - 1)],
            jnp.float32,
        )
        n_r = (inner_sched[r] if inner_sched is not None
               else cfg.max_inner_iteration)
        out = pallas_step.fused_round(
            cfg, kv, kvt, mixm, alpha, lam_sg, lam_jl, ful, lr0, n_r,
            start, goal, ox, oy, ow,
            solver=solver, block_b=block_b, stream_rb=stream_rb,
            interpret=interpret, lean=lean, ultra=ultra, bf16=bf16,
        )
        # Penalty-escalation bookkeeping: op-for-op the whole-solve kernel's
        # in-kernel epilogue (same f32 arithmetic — bitwise identical).
        was = ful
        now = jnp.maximum(was, out.ok)
        floss = jnp.where(was > 0.5, floss, out.loss)
        outer = jnp.where(now > 0.5, outer, outer + 1.0)
        lam_sg = jnp.where(now > 0.5, lam_sg, lam_sg * inc)
        lam_jl = jnp.where(now > 0.5, lam_jl, lam_jl * inc)
        total_inner = total_inner + out.inner
        last_steps = out.inner[0]
        ful = now
        alpha = out.alpha

    inv = jnp.argsort(perm)  # undo the composed permutation
    return SolveResult(
        alpha=alpha_from_fleet(jnp.moveaxis(take(alpha, inv), 0, 1)),
        stats=SolveStats(
            outer_iters=take(outer, inv)[0].astype(jnp.int32),
            inner_iters=take(total_inner, inv)[0].astype(jnp.int32),
            converged=take(ful, inv)[0] > 0.5,
            final_cost=take(floss, inv)[0],
        ),
    )


def _pallas_solve(
    cfg: PlannerConfig, basis, scn: Scenario, a0, block_b: int,
    solver: str = "bls", stream_rb: int = 0, interpret: bool = False,
    lean: bool = False, ultra: bool = False, bf16: bool = False,
) -> SolveResult:
    """Penalty-method dual loop with the fused Pallas kernels: one kernel
    launch per inner step (in-kernel lane freezing), one eval kernel per
    penalty round.  State lives in kernel layout (J, T, B) throughout.

    ``lean``/``ultra`` are accepted for dispatch uniformity but have no
    effect here: they name solve-scope VMEM carries (FK / (traj, vel))
    that only the whole-solve and per-round kernels hold — the per-step
    path round-trips all state through HBM every step by design."""
    from ..ops import pallas_step

    ox = scn.obstacles[:, 0, :]
    oy = scn.obstacles[:, 1, :]
    ow = scn.obstacle_weight
    kvt = basis.kv.T
    B = a0.shape[-1]
    step_fn = {
        "bls": pallas_step.bls_inner_step,
        "gd": pallas_step.gd_inner_step,
    }[solver]
    gd_schedule = jnp.asarray(cfg.gd_lr, dtype=jnp.float32)
    # Exact end-of-round constraint evaluation (config.exact_constraint_eval;
    # ref: trajectory.py:129-137 checks constraints on evaluate(alpha)): the
    # kernel state's (traj, vel) are the linearized carry in BLS linearized
    # mode, so the constraint check re-evaluates alpha through the forward
    # kernel (bitwise the fused kernels' in-kernel re-evaluation — same
    # body.forward_planes op sequence).  GD / exact ladder carry exact
    # planes already.
    exact_cc = (
        solver == "bls" and cfg.ladder_eval == "linearized"
        and cfg.exact_constraint_eval
    )

    def inner_round(alpha, lam_sg, lam_jl, skip, outer_iter, round_idx=None):
        """One penalty round.  ``skip`` lanes (already fulfilled) are frozen
        from step 0.  Returns (alpha, traj, vel, iters, loss)."""
        bound = inner_loop_bound(cfg, round_idx)
        ev = pallas_step.cost_grad_eval(
            cfg, basis.kv, kvt, basis.mix, alpha,
            lam_sg[None], lam_jl[None], scn.start, scn.goal, ox, oy, ow,
            block_b=block_b, stream_rb=stream_rb, interpret=interpret,
        )
        minimized0 = skip.astype(jnp.float32)[None]
        if solver == "bls":
            lr0 = jnp.full((1, B), cfg.bls_lr_start, jnp.float32)
        else:
            # per-lane learning rate from the per-outer-round schedule
            # (ref: optimizer_GD.py:209)
            lr0 = gd_schedule[jnp.clip(outer_iter, 0, len(cfg.gd_lr) - 1)][None]

        state0 = (
            alpha, ev.grad, ev.traj, ev.vel, ev.loss,
            lr0,
            minimized0,
            jnp.zeros((B,), jnp.int32),   # accepted-step counter
            jnp.asarray(0, jnp.int32),    # loop counter
        )

        def body(s):
            al, gr, tr, ve, lo, lr, mn, iters, k = s
            out = step_fn(
                cfg, basis.kv, kvt, basis.mix, al, gr, tr, ve,
                lo, lr, mn, lam_sg[None], lam_jl[None],
                scn.start, scn.goal, ox, oy, ow,
                block_b=block_b, stream_rb=stream_rb, interpret=interpret,
            )
            stepped = jnp.logical_and(mn[0] < 0.5, out.minimized[0] < 0.5)
            return (
                out.new_alpha, out.new_grad, out.new_traj, out.new_vel,
                out.new_loss, out.new_lr, out.minimized,
                iters + stepped.astype(jnp.int32), k + 1,
            )

        if cfg.fixed_iters:
            final = jax.lax.fori_loop(
                0, bound, lambda _, s: body(s), state0
            )
        else:
            final = jax.lax.while_loop(
                lambda s: jnp.logical_and(
                    s[-1] < cfg.max_inner_iteration, jnp.any(s[6][0] < 0.5)
                ),
                body,
                state0,
            )
        al, _, tr, ve, lo, _, _, iters, _ = final
        if exact_cc:
            fw = pallas_step.forward_eval(
                cfg, basis.kv, basis.mix, al,
                block_b=block_b, stream_rb=stream_rb, interpret=interpret,
            )
            tr, ve = fw.traj, fw.vel
        return al, tr, ve, iters, lo[0]

    inc = jnp.float32(cfg.lambda_constraint_increase)

    def outer_body(state: _PallasOuter, round_idx=None) -> _PallasOuter:
        alpha, traj, vel, iters, loss = inner_round(
            state.alpha, state.lam_sg, state.lam_jl, state.fulfilled,
            state.outer_iter, round_idx,
        )
        ok = _planes_constraints(cfg, scn, traj, vel)
        was = state.fulfilled
        now = jnp.logical_or(was, ok)
        return _PallasOuter(
            fulfilled=now,
            outer_iter=jnp.where(now, state.outer_iter, state.outer_iter + 1),
            alpha=alpha,
            lam_sg=jnp.where(now, state.lam_sg, state.lam_sg * inc),
            lam_jl=jnp.where(now, state.lam_jl, state.lam_jl * inc),
            total_inner=state.total_inner + iters,
            final_loss=jnp.where(was, state.final_loss, loss),
        )

    init = _PallasOuter(
        fulfilled=jnp.zeros((B,), bool),
        outer_iter=jnp.zeros((B,), jnp.int32),
        alpha=a0,
        lam_sg=jnp.full((B,), cfg.lambda_sg_constraint, jnp.float32),
        lam_jl=jnp.full((B,), cfg.lambda_jl_constraint, jnp.float32),
        total_inner=jnp.zeros((B,), jnp.int32),
        final_loss=jnp.full((B,), jnp.inf, jnp.float32),
    )

    if cfg.fixed_iters:
        final = jax.lax.fori_loop(
            0, cfg.max_outer_iteration, lambda r, s: outer_body(s, r), init
        )
    else:
        final = jax.lax.while_loop(
            lambda s: jnp.any(
                jnp.logical_and(
                    s.outer_iter < cfg.max_outer_iteration,
                    jnp.logical_not(s.fulfilled),
                )
            ),
            outer_body,
            init,
        )
    return SolveResult(
        alpha=alpha_from_fleet(jnp.moveaxis(final.alpha, 0, 1)),
        stats=SolveStats(
            outer_iters=final.outer_iter,
            inner_iters=final.total_inner,
            converged=final.fulfilled,
            final_cost=final.final_loss,
        ),
    )


class _GdInner(NamedTuple):
    minimized: jnp.ndarray
    inner_iter: jnp.ndarray
    alpha: jnp.ndarray
    loss: jnp.ndarray
    grad: jnp.ndarray


def _make_gd_inner(cfg: PlannerConfig, basis, scn: Scenario):
    lr_schedule = jnp.asarray(cfg.gd_lr, dtype=jnp.float32)
    tol = jnp.float32(cfg.loop_loss_reduction)

    def for_outer(outer_iter, round_idx=None):
        # outer_iter is (B,) — per-lane learning rate (lanes can sit at
        # different penalty rounds, ref: optimizer_GD.py:209).
        lr = lr_schedule[jnp.clip(outer_iter, 0, len(cfg.gd_lr) - 1)]  # (B,)
        bound = inner_loop_bound(cfg, round_idx)

        def inner(alpha, penalty: Penalty):
            loss0, grad0 = fleet_cost_and_grad(cfg, basis, scn, penalty, alpha)
            B = loss0.shape[0]

            def _raw_body(s: _GdInner) -> _GdInner:
                new_alpha = (1.0 - cfg.lambda_reg * lr) * s.alpha - lr * s.grad
                new_loss, new_grad = fleet_cost_and_grad(
                    cfg, basis, scn, penalty, new_alpha
                )
                stop = s.loss - new_loss < tol
                return _GdInner(
                    minimized=stop,
                    inner_iter=jnp.where(stop, s.inner_iter, s.inner_iter + 1),
                    alpha=jnp.where(stop, s.alpha, new_alpha),
                    loss=jnp.where(stop, s.loss, new_loss),
                    grad=jnp.where(stop, s.grad, new_grad),
                )

            def body(s: _GdInner) -> _GdInner:
                # Freeze minimized AND budget-exhausted lanes: the batched
                # early-exit while_loop keeps running while any lane is
                # active, and without the exhaustion term a capped lane
                # would take extra steps it never gets alone (see
                # common.py::run_dual_loop's outer freeze).
                done = jnp.logical_or(
                    s.minimized, s.inner_iter >= cfg.max_inner_iteration
                )
                return freeze_when(done, s, _raw_body(s))

            init = _GdInner(
                minimized=jnp.zeros(B, bool),
                inner_iter=jnp.zeros(B, jnp.int32),
                alpha=alpha,
                loss=loss0,
                grad=grad0,
            )
            if cfg.fixed_iters:
                final = jax.lax.fori_loop(
                    0, bound, lambda _, s: body(s), init
                )
            else:
                final = jax.lax.while_loop(
                    lambda s: jnp.any(
                        jnp.logical_and(
                            s.inner_iter < cfg.max_inner_iteration,
                            jnp.logical_not(s.minimized),
                        )
                    ),
                    body,
                    init,
                )
            return final.alpha, final.inner_iter, final.loss

        return inner

    return for_outer


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------


def fleet_solve(
    cfg: PlannerConfig,
    basis: Basis,
    scenarios: Scenario,
    alpha0: Optional[jnp.ndarray] = None,
    solver: str = "bls",
    backend: str = "xla",
    interpret: bool = False,
) -> SolveResult:
    """Solve a batch of scenarios in the batch-trailing layout.

    Args:
      scenarios: leading-batch Scenario (same convention as solve_batch).
      alpha0: optional (B, T, J) warm start.
      backend: 'xla' (portable), 'pallas' (fused TPU mega-kernel per inner
        step), or 'fused' (the whole solve as ONE VMEM-resident kernel —
        fastest).  Pallas backends require batch % 128 == 0; 'interpret'
        runs them interpreted for CPU testing.
    Returns: SolveResult with leading-batch leaves.
    """
    if solver == "bls" and cfg.bls_mode == "sequential":
        # Never silently substitute semantics: the fleet/pallas engines
        # implement the line search exclusively as the parallel ladder
        # (which enumerates exactly the lr sequence the sequential
        # backtracking loop would try and selects the same first-passing
        # step — see solvers/bls.py docstring — but evaluates candidates
        # through the linearized trajectory, a different fp path).  For the
        # reference's sequential execution at batch scale use the vmap
        # engine (solvers/batched.py), which honors bls_mode.
        raise ValueError(
            "bls_mode='sequential' is not supported by the fleet engine; "
            "use bls_mode='ladder' (same trial sequence) or the vmap engine"
        )
    if cfg.lane_compaction and backend != "fused":
        # Same stance as bls_mode='sequential' above: never silently ignore
        # a requested semantic/performance mode.  Compaction is a per-round
        # fused-kernel driver feature; the per-step and XLA engines have no
        # round-boundary state in HBM to re-sort.
        raise ValueError(
            f"lane_compaction=True requires backend='fused' (got "
            f"{backend!r}); unset it or switch backends"
        )
    fs = to_fleet(scenarios)
    B = scenarios.start.shape[0]
    if alpha0 is None:
        a0 = fleet_init_alpha(cfg, basis, fs)
    else:
        a0 = alpha_to_fleet(alpha0)
    penalty0 = Penalty(
        jnp.full((B,), cfg.lambda_sg_constraint, jnp.float32),
        jnp.full((B,), cfg.lambda_jl_constraint, jnp.float32),
    )
    if backend in ("pallas", "fused"):
        from ..ops import pallas_step

        plan = pallas_step.choose_kernel_plan(cfg, cfg.n_timesteps, B,
                                              solver=solver)
        if plan is None:
            # Kernel backends infeasible (scoped-VMEM model says even a
            # 128-lane tile with the streamed basis would blow the raised
            # cap, or the batch has no legal tiling): fall back to the
            # HBM-resident XLA engine, which handles any problem size.
            import warnings

            warnings.warn(
                f"pallas backends infeasible for T={cfg.n_timesteps}, "
                f"B={B} (scoped-VMEM estimate over cap even with the "
                f"streamed basis, or no legal lane tile); falling back to "
                f"backend='xla'"
                + (" — lane_compaction is DROPPED on this path (it is a "
                   "fused-kernel driver feature)" if cfg.lane_compaction
                   else ""),
                stacklevel=2,
            )
            backend = "xla"
        elif backend == "pallas" and (plan.lean or plan.ultra):
            # The lean/ultra tiers name solve-scope VMEM carries that only
            # the whole-solve/per-round kernels hold; the per-step kernels
            # cannot shed them, and at these problem sizes their own
            # scoped usage is past the raised cap (the tiers exist exactly
            # because the carrying footprint no longer fits).  Never
            # substitute a different kernel silently — fall back to the
            # HBM-resident XLA engine with a warning, like the
            # plan-infeasible path above.
            import warnings

            warnings.warn(
                f"backend='pallas' (per-step kernels) cannot run the "
                f"{'ultra' if plan.ultra else 'lean'} plan at "
                f"T={cfg.n_timesteps} (per-step kernels have no "
                f"solve-scope carry to shed and would exceed the scoped-"
                f"VMEM cap); falling back to backend='xla' — use "
                f"backend='fused' for the large-T kernel tiers",
                stacklevel=2,
            )
            backend = "xla"
        else:
            a0k = jnp.moveaxis(a0, 1, 0)  # (T,J,B) -> kernel layout (J,T,B)
            if backend == "fused" and cfg.lane_compaction:
                # Heterogeneous-fleet mode: per-round kernel launches with
                # between-round lane compaction (bitwise-equal per lane).
                solve_impl = _pallas_fused_rounds_solve
            elif backend == "fused":
                solve_impl = _pallas_fused_solve
            else:
                solve_impl = _pallas_solve
            return solve_impl(cfg, basis, fs, a0k, plan.block_b,
                              solver=solver, stream_rb=plan.stream_rb,
                              interpret=interpret, lean=plan.lean,
                              ultra=plan.ultra, bf16=plan.bf16)
    make_inner = {"bls": _make_bls_inner, "gd": _make_gd_inner}[solver]
    inner = make_inner(cfg, basis, fs)
    res = run_dual_loop(
        cfg,
        basis,
        fs,  # only passed through to constraints_fn below
        a0,
        inner,
        constraints_fn=lambda a: fleet_constraints(cfg, basis, fs, a),
        penalty0=penalty0,
    )
    return SolveResult(
        alpha=alpha_from_fleet(res.alpha),
        stats=res.stats,
    )


def make_fleet_solver(
    cfg: PlannerConfig,
    basis: Basis,
    solver: str = "bls",
    backend: str = "xla",
    interpret: bool = False,
):
    """Jitted fleet solver: leading-batch Scenario -> SolveResult.

    The basis is bound as a traced ARGUMENT, not a closure constant:
    executables with large embedded constants pay a ~20 ms fixed cost per
    dispatch through the remote-TPU tunnel (measured: same program, same
    inputs — 23 ms as closure constants vs 0.1 ms as arguments)."""

    @jax.jit
    def run(basis_arg: Basis, scenarios: Scenario) -> SolveResult:
        return fleet_solve(
            cfg, basis_arg, scenarios, solver=solver, backend=backend,
            interpret=interpret,
        )

    return functools.partial(run, basis)
