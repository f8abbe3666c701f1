"""Pallas TPU mega-kernel: one fused BLS inner step for the fleet solver.

Motivation (measured on TPU v5e): the XLA fleet inner step costs ~2-3 ms at
B=1024 while its arithmetic is worth ~100 us — the gap is dozens of small
kernels with per-kernel overhead and HBM round-trips between them.  This
kernel executes the ENTIRE inner step — normalized direction, the Armijo
ladder over all candidate learning rates (via the linearized evaluation),
first-pass selection, the accepted step, and the fused cost+gradient at the
new iterate — in one Pallas program per 128-lane batch tile, keeping every
intermediate in VMEM.

Layout: per-joint "planes".  Every (T, J, B) tensor is stored (J, T, B); the
kernel slices j-planes of shape (T, B_TILE) so all elementwise work runs on
full (8, 128) VPU tiles and the basis contraction is J small MXU dots
``kv (2T, T) @ plane (T, B_TILE)`` — clean 128-column GEMMs with no in-kernel
relayouts.

Precision: all dots use ``precision=HIGHEST`` — verified bitwise-equal to
the XLA HIGHEST path on the cancellation-heavy RKHS coefficients (the fit
produces O(1e4) alphas whose basis products cancel to O(1); bf16 passes are
unusable there).

Semantics: identical math to solvers/fleet.py::_make_bls_inner's _raw_body
(which in turn mirrors ref: optimizer_BLS.py:126-213 with the parallel
ladder redesign).  tests/test_pallas_step.py checks it lane-for-lane against
the XLA fleet implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PlannerConfig
from ..models import robot
from ..models.rkhs import Basis

HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=HIGHEST, preferred_element_type=jnp.float32,
    )


def _make_kernel(cfg: PlannerConfig, T: int, J: int, O: int, BT: int):
    """Build the kernel body with all shapes/hyperparams closed over
    statically."""
    n = cfg.max_bls_iteration
    lam_reg = cfg.lambda_reg
    lam_max = cfg.lambda_max_cost
    bls_alpha = cfg.bls_alpha
    beta_minus = cfg.bls_beta_minus
    beta_plus = cfg.bls_beta_plus
    tol = cfg.loop_loss_reduction
    safety = cfg.joint_safety_limit
    max_jp = cfg.max_joint_position
    min_jp = cfg.min_joint_position
    max_jv = cfg.max_joint_velocity
    mean_jp = 0.5 * (max_jp + min_jp)
    std_jp = 0.5 * (max_jp - mean_jp)
    link = [float(l) for l in cfg.link_length]
    cvdl = cfg.constraint_violating_dependant_loss

    def forward_planes(kv, mix, planes):
        """planes: list of J (T, BT) alpha planes -> (traj, vel) lists of J
        (T, BT) planes after basis GEMM + joint mixing."""
        raw = [_dot(kv, planes[j]) for j in range(J)]          # J x (2T, BT)
        out_t, out_v = [], []
        for i in range(J):
            acc = raw[0] * mix[0, i]
            for j in range(1, J):
                acc = acc + raw[j] * mix[j, i]
            out_t.append(acc[:T])
            out_v.append(acc[T:])
        return out_t, out_v

    def fk_ee(traj):
        """J (T, BT) planes -> ee_x, ee_y (T, BT) + cumangles (list)."""
        c = []
        acc = traj[0]
        c.append(acc)
        for j in range(1, J):
            acc = acc + traj[j]
            c.append(acc)
        ee_x = link[0] * jnp.cos(c[0])
        ee_y = link[0] * jnp.sin(c[0])
        for j in range(1, J):
            ee_x = ee_x + link[j] * jnp.cos(c[j])
            ee_y = ee_y + link[j] * jnp.sin(c[j])
        return ee_x, ee_y, c

    def obstacle_cost_v(ee_x, ee_y, ox, oy, ow):
        """Accumulated per-timestep obstacle cost (T, BT).  ox/oy/ow are
        (O, BT) lane tables (rows broadcast against planes)."""
        acc = jnp.zeros_like(ee_x)
        for o in range(O):
            dx = ee_x - ox[o:o + 1]        # (T, BT) - (1, BT)
            dy = ee_y - oy[o:o + 1]
            d2 = dx * dx + dy * dy
            acc = acc + ow[o:o + 1] * (0.8 / (0.5 + 0.5 * d2))
        return acc

    def scalar_cost(traj, vel, cost_v, start, goal, lam_sg, lam_jl):
        """Total penalized cost (1, BT) given planes + obstacle cost_v."""
        toc = lam_max * jnp.max(cost_v, axis=0, keepdims=True) + (
            (1.0 - lam_max) / T
        ) * jnp.sum(cost_v, axis=0, keepdims=True)
        sgpc = jnp.zeros_like(toc)
        sgvc = jnp.zeros_like(toc)
        jpc = jnp.zeros_like(toc)
        jvc = jnp.zeros_like(toc)
        for j in range(J):
            ds = traj[j][0:1] - start[j:j + 1]
            dg = traj[j][T - 1:T] - goal[j:j + 1]
            sgpc = sgpc + 0.5 * (ds * ds + dg * dg)
            vs = vel[j][0:1]
            vg = vel[j][T - 1:T]
            sgvc = sgvc + 0.5 * (vs * vs + vg * vg)
            zp = (traj[j] - mean_jp) / std_jp
            pl_ = 0.5 * zp * zp
            zv = vel[j] / max_jv
            vl_ = 0.5 * zv * zv
            if cvdl:
                pmask = jnp.logical_or(
                    traj[j] > safety * max_jp, traj[j] < safety * min_jp
                )
                vmask = jnp.abs(vel[j]) > safety * max_jv
                pl_ = jnp.where(pmask, pl_, 0.0)
                vl_ = jnp.where(vmask, vl_, 0.0)
            jpc = jpc + jnp.sum(pl_, axis=0, keepdims=True) / T
            jvc = jvc + jnp.sum(vl_, axis=0, keepdims=True) / T
        return toc + lam_sg * (sgpc + sgvc) + lam_jl * (jpc + jvc)

    def kernel(
        # inputs
        kv_ref, kvt_ref, mix_ref,
        alpha_ref, grad_ref, traj_ref, vel_ref,
        loss_ref, lr_ref, lamsg_ref, lamjl_ref,
        start_ref, goal_ref, ox_ref, oy_ref, ow_ref,
        # outputs
        new_alpha_ref, new_grad_ref, new_traj_ref, new_vel_ref,
        new_loss_ref, new_lr_ref, stop_ref,
    ):
        kv = kv_ref[:]
        kvt = kvt_ref[:]
        mix = mix_ref[:]
        lam_sg = lamsg_ref[:]
        lam_jl = lamjl_ref[:]
        start = start_ref[:]
        goal = goal_ref[:]
        ox, oy, ow = ox_ref[:], oy_ref[:], ow_ref[:]
        loss = loss_ref[:]
        bls_lr = lr_ref[:]

        grad = [grad_ref[j] for j in range(J)]
        alpha = [alpha_ref[j] for j in range(J)]
        traj = [traj_ref[j] for j in range(J)]
        vel = [vel_ref[j] for j in range(J)]

        # --- normalized direction + reference's alpha_norm quirk ---
        g2 = jnp.zeros((1, BT), jnp.float32)
        grs = jnp.zeros((1, BT), jnp.float32)  # per-t row sums accumulated below
        for j in range(J):
            g2 = g2 + jnp.sum(grad[j] * grad[j], axis=0, keepdims=True)
        inv_norm = jax.lax.rsqrt(g2)
        n_grad = [grad[j] * inv_norm for j in range(J)]
        # alpha_norm = sum_t (sum_j grad[t,j]) * (sum_j n_grad[t,j])
        gsum = grad[0]
        for j in range(1, J):
            gsum = gsum + grad[j]
        alpha_norm = jnp.sum(gsum * (gsum * inv_norm), axis=0, keepdims=True)

        # --- evaluate the search direction once (linearization) ---
        gtraj, gvel = forward_planes(kv, mix, n_grad)

        # --- ladder: all candidate lrs, cost per rung ---
        # j_best: first Armijo-passing rung (n if none); running 'found' mask.
        found = jnp.zeros((1, BT), jnp.float32)
        j_best = jnp.full((1, BT), float(n), jnp.float32)
        lr_best = jnp.zeros((1, BT), jnp.float32)
        loss_best = loss
        rung = 1.0
        for r in range(n):
            lr_r = bls_lr * rung                              # (1, BT)
            a_fac = 1.0 - lam_reg * lr_r
            cand_t = [a_fac * traj[j] - lr_r * gtraj[j] for j in range(J)]
            cand_v = [a_fac * vel[j] - lr_r * gvel[j] for j in range(J)]
            ee_x, ee_y, _ = fk_ee(cand_t)
            cost_v = obstacle_cost_v(ee_x, ee_y, ox, oy, ow)
            closs = scalar_cost(cand_t, cand_v, cost_v, start, goal, lam_sg, lam_jl)
            required = loss - bls_alpha * lr_r * alpha_norm
            ok = jnp.logical_and(closs <= required, found == 0.0)
            okf = ok.astype(jnp.float32)
            j_best = j_best + okf * (float(r) - float(n))     # n -> r when ok
            lr_best = lr_best + okf * lr_r
            loss_best = jnp.where(ok, closs, loss_best)
            found = jnp.maximum(found, okf)
            rung = rung * beta_minus

        any_ok = found > 0.0
        lr_eff = jnp.where(any_ok, lr_best, 0.0)
        new_lr = jnp.where(
            any_ok, lr_best * beta_plus, bls_lr * (beta_minus ** n)
        )
        new_loss_sel = loss_best
        stop = (loss - new_loss_sel) < tol

        # --- accepted step ---
        a_fac = 1.0 - lam_reg * lr_eff
        new_alpha = [a_fac * alpha[j] - lr_eff * n_grad[j] for j in range(J)]

        # --- fused cost + gradient + evaluation at the new iterate ---
        nt, nv = forward_planes(kv, mix, new_alpha)
        ee_x, ee_y, cang = fk_ee(nt)

        # obstacle value+grad wrt ee
        cost_v = jnp.zeros((T, BT), jnp.float32)
        gx = jnp.zeros((T, BT), jnp.float32)
        gy = jnp.zeros((T, BT), jnp.float32)
        for o in range(O):
            dx = ee_x - ox[o:o + 1]
            dy = ee_y - oy[o:o + 1]
            d2 = dx * dx + dy * dy
            inv = 1.0 / (0.5 + 0.5 * d2)
            cost_v = cost_v + ow[o:o + 1] * (0.8 * inv)
            coef = (-0.8) * ow[o:o + 1] * (inv * inv)
            gx = gx + coef * dx
            gy = gy + coef * dy

        # blend weights: lam_max at the argmax timestep + (1-lam_max)/T
        cmax = jnp.max(cost_v, axis=0, keepdims=True)
        toc = lam_max * cmax + ((1.0 - lam_max) / T) * jnp.sum(
            cost_v, axis=0, keepdims=True
        )
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, BT), 0)
        # exact argmax (first maximal row) to match jnp.argmax semantics
        first_max = jnp.min(
            jnp.where(cost_v == cmax, row_ids, T), axis=0, keepdims=True
        )
        wblend = lam_max * (row_ids == first_max).astype(jnp.float32) + (
            (1.0 - lam_max) / T
        )
        wgx = wblend * gx
        wgy = wblend * gy

        # workspace Jacobian via reverse cumsum over joints:
        # dEE/dtheta_j = sum_{i>=j} link_i * [-sin, cos](cang_i)
        sx = [(-link[j]) * jnp.sin(cang[j]) for j in range(J)]
        sy = [link[j] * jnp.cos(cang[j]) for j in range(J)]
        jac_x = [jnp.zeros((T, BT), jnp.float32)] * J
        jac_y = [jnp.zeros((T, BT), jnp.float32)] * J
        accx = jnp.zeros((T, BT), jnp.float32)
        accy = jnp.zeros((T, BT), jnp.float32)
        for j in range(J - 1, -1, -1):
            accx = accx + sx[j]
            accy = accy + sy[j]
            jac_x[j] = accx
            jac_y[j] = accy

        new_loss_out = scalar_cost(nt, nv, cost_v, start, goal, lam_sg, lam_jl)

        # position-space and velocity-space gradients per joint
        zero_mid = jnp.concatenate(
            [jnp.ones((1, BT), jnp.float32),
             jnp.zeros((T - 2, BT), jnp.float32),
             jnp.ones((1, BT), jnp.float32)], axis=0
        )
        first_row = jnp.concatenate(
            [jnp.ones((1, BT), jnp.float32), jnp.zeros((T - 1, BT), jnp.float32)],
            axis=0,
        )
        last_row = jnp.concatenate(
            [jnp.zeros((T - 1, BT), jnp.float32), jnp.ones((1, BT), jnp.float32)],
            axis=0,
        )
        grad_pos = []
        grad_vel = []
        for j in range(J):
            toc_g = wgx * jac_x[j] + wgy * jac_y[j]
            sgp = first_row * (nt[j] - start[j:j + 1]) + last_row * (
                nt[j] - goal[j:j + 1]
            )
            sgv = first_row * nv[j] + last_row * nv[j]
            jp = (nt[j] - mean_jp) / (std_jp * std_jp)
            jv = nv[j] / (max_jv * max_jv)
            if cvdl:
                pmask = jnp.logical_or(
                    nt[j] > safety * max_jp, nt[j] < safety * min_jp
                )
                vmask = jnp.abs(nv[j]) > safety * max_jv
                jp = jnp.where(pmask, jp, 0.0)
                jv = jnp.where(vmask, jv, 0.0)
            grad_pos.append(toc_g + lam_sg * sgp + lam_jl * (jp / T))
            grad_vel.append(lam_sg * sgv + lam_jl * (jv / T))

        # chain rule: (kv^T @ [grad_pos; grad_vel]) @ mix^T, per joint planes
        pulled = []
        for j in range(J):
            stacked = jnp.concatenate([grad_pos[j], grad_vel[j]], axis=0)  # (2T, BT)
            pulled.append(_dot(kvt, stacked))                               # (T, BT)
        for j in range(J):
            acc = pulled[0] * mix[j, 0]
            for i in range(1, J):
                acc = acc + pulled[i] * mix[j, i]
            new_grad_ref[j] = acc

        for j in range(J):
            new_alpha_ref[j] = new_alpha[j]
            new_traj_ref[j] = nt[j]
            new_vel_ref[j] = nv[j]
        new_loss_ref[:] = jnp.where(stop, new_loss_sel, new_loss_out)
        new_lr_ref[:] = new_lr
        stop_ref[:] = stop.astype(jnp.float32)

    return kernel


class PallasStep(NamedTuple):
    new_alpha: jnp.ndarray  # (J, T, B)
    new_grad: jnp.ndarray
    new_traj: jnp.ndarray
    new_vel: jnp.ndarray
    new_loss: jnp.ndarray   # (1, B)
    new_lr: jnp.ndarray     # (1, B)
    stop: jnp.ndarray       # (1, B) f32 0/1


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_b", "interpret")
)
def bls_inner_step(
    cfg: PlannerConfig,
    kv, kvt, mix,
    alpha, grad, traj, vel,        # (J, T, B)
    loss, bls_lr, lam_sg, lam_jl,  # (1, B)
    start, goal,                   # (J, B)
    ox, oy, ow,                    # (O, B)
    block_b: int = 128,
    interpret: bool = False,
) -> PallasStep:
    """One fused BLS inner step over the whole fleet (grid over B tiles)."""
    J, T, B = alpha.shape
    O = ox.shape[0]
    BT = block_b
    assert B % BT == 0, f"batch {B} must be a multiple of block_b {BT}"

    kernel = _make_kernel(cfg, T, J, O, BT)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def lanes3(d0, d1):
        return pl.BlockSpec((d0, d1, BT), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def lanes2(d0):
        return pl.BlockSpec((d0, BT), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    grid = (B // BT,)
    out_shape = (
        jax.ShapeDtypeStruct((J, T, B), jnp.float32),  # new_alpha
        jax.ShapeDtypeStruct((J, T, B), jnp.float32),  # new_grad
        jax.ShapeDtypeStruct((J, T, B), jnp.float32),  # new_traj
        jax.ShapeDtypeStruct((J, T, B), jnp.float32),  # new_vel
        jax.ShapeDtypeStruct((1, B), jnp.float32),     # new_loss
        jax.ShapeDtypeStruct((1, B), jnp.float32),     # new_lr
        jax.ShapeDtypeStruct((1, B), jnp.float32),     # stop
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            full((2 * T, T)), full((T, 2 * T)), full((J, J)),
            lanes3(J, T), lanes3(J, T), lanes3(J, T), lanes3(J, T),
            lanes2(1), lanes2(1), lanes2(1), lanes2(1),
            lanes2(J), lanes2(J), lanes2(O), lanes2(O), lanes2(O),
        ],
        out_specs=(
            lanes3(J, T), lanes3(J, T), lanes3(J, T), lanes3(J, T),
            lanes2(1), lanes2(1), lanes2(1),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        kv, kvt, mix, alpha, grad, traj, vel,
        loss, bls_lr, lam_sg, lam_jl, start, goal, ox, oy, ow,
    )
    return PallasStep(*outs)
