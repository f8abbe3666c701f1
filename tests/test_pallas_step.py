"""Pallas mega-kernel vs the XLA fleet inner step, lane for lane
(interpret mode on CPU; the TPU-compiled path is exercised by bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import irm_motion_planning_tpu as mp
from irm_motion_planning_tpu.ops import pallas_step
from irm_motion_planning_tpu.ops.costs import Penalty
from irm_motion_planning_tpu.solvers import fleet


def _xla_reference_step(cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr):
    """The exact math of fleet._make_bls_inner's _raw_body, (T, J, B) layout."""
    n = cfg.max_bls_iteration
    rungs = jnp.power(jnp.float32(cfg.bls_beta_minus),
                      jnp.arange(n, dtype=jnp.float32))
    gnorm = jnp.sqrt(jnp.sum(jnp.square(grad), axis=(0, 1)))
    n_grad = grad / gnorm
    alpha_norm = jnp.sum(jnp.sum(grad, axis=1) * jnp.sum(n_grad, axis=1), axis=0)
    gtraj, gvel = fleet.fleet_evaluate(cfg, basis, n_grad)
    lrs = rungs[:, None] * bls_lr[None]
    a_fac = 1.0 - cfg.lambda_reg * lrs
    cand_traj = a_fac * traj[:, :, None] - lrs * gtraj[:, :, None]
    cand_vel = a_fac * vel[:, :, None] - lrs * gvel[:, :, None]
    cand_loss = fleet.fleet_cost_from_traj(cfg, fs, pen, cand_traj, cand_vel)
    required = loss[None] - cfg.bls_alpha * lrs * alpha_norm[None]
    ok = cand_loss <= required
    any_ok = jnp.any(ok, axis=0)
    j = jnp.argmax(ok, axis=0)
    lr_sel = jnp.take_along_axis(lrs, j[None], axis=0)[0]
    lr_eff = jnp.where(any_ok, lr_sel, 0.0)
    new_alpha = (1.0 - cfg.lambda_reg * lr_eff) * alpha - lr_eff * n_grad
    sel_loss = jnp.take_along_axis(cand_loss, j[None], axis=0)[0]
    new_loss = jnp.where(any_ok, sel_loss, loss)
    new_lr = jnp.where(any_ok, lr_sel * cfg.bls_beta_plus,
                       bls_lr * jnp.float32(cfg.bls_beta_minus) ** n)
    stop = loss - new_loss < cfg.loop_loss_reduction
    nl, ng, nt, nv = fleet.fleet_cost_grad_eval(cfg, basis, fs, pen, new_alpha)
    return (new_alpha, ng, nt, nv, jnp.where(stop, new_loss, nl), new_lr, stop)


@pytest.fixture(scope="module")
def setup():
    # recip_newton=True: these are LANE-FOR-LANE equivalence tests against
    # the XLA fleet's exact divides, so the kernel's reciprocal must be at
    # refined (1.4e-5) accuracy.  The raw-approximation default is gated
    # distributionally instead (benchmarks/quality.py on TPU).
    cfg = mp.PlannerConfig(recip_newton=True)
    basis = mp.make_basis(cfg)
    B = 128
    key = jax.random.PRNGKey(3)
    scns = mp.random_scenarios(cfg, key, B)
    fs = fleet.to_fleet(scns)
    pen = Penalty(jnp.full((B,), 0.5), jnp.full((B,), 0.1))
    alpha = fleet.fleet_init_alpha(cfg, basis, fs)
    loss, grad, traj, vel = fleet.fleet_cost_grad_eval(cfg, basis, fs, pen, alpha)
    bls_lr = jnp.full((B,), cfg.bls_lr_start, jnp.float32)
    return cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr


def _run_pallas(cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr,
                minimized=None):
    tr = lambda x: jnp.moveaxis(x, 1, 0).copy()  # (T,J,B)->(J,T,B)
    row = lambda x: x[None, :]
    if minimized is None:
        minimized = jnp.zeros((1, loss.shape[0]), jnp.float32)
    return pallas_step.bls_inner_step(
        cfg,
        basis.kv, basis.kv.T, basis.mix,
        tr(alpha), tr(grad), tr(traj), tr(vel),
        row(loss), row(bls_lr), minimized,
        row(pen.lambda_sg), row(pen.lambda_jl),
        fs.start, fs.goal,
        fs.obstacles[:, 0, :], fs.obstacles[:, 1, :], fs.obstacle_weight,
        interpret=True,
    )


def test_pallas_step_matches_xla(setup):
    cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr = setup
    ref = _xla_reference_step(
        cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr
    )
    out = _run_pallas(cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr)

    ra, rg, rt, rv, rl, rlr, rstop = ref
    back = lambda x: np.moveaxis(np.asarray(x), 0, 1)  # (J,T,B)->(T,J,B)
    # Interpret-mode Pallas and XLA share the same op semantics on CPU, but
    # reduction/fusion orders differ -> fp tolerance, amplified through the
    # large-cancellation alpha (O(1e4) coefficients).
    np.testing.assert_allclose(back(out.new_alpha), np.asarray(ra),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(back(out.new_traj), np.asarray(rt),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(back(out.new_vel), np.asarray(rv),
                               rtol=1e-3, atol=2e-1)
    np.testing.assert_allclose(np.asarray(out.new_loss)[0], np.asarray(rl),
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out.new_lr)[0], np.asarray(rlr),
                               rtol=1e-5)
    agree = (np.asarray(out.minimized)[0] > 0.5) == np.asarray(rstop)
    assert agree.mean() > 0.95  # stop flags may flip on near-threshold lanes


def test_pallas_step_frozen_lanes_pass_through(setup):
    """Lanes entering with minimized=1 must come out bit-identical."""
    cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr = setup
    B = loss.shape[0]
    frozen = jnp.ones((1, B), jnp.float32)
    out = _run_pallas(cfg, basis, fs, pen, alpha, grad, traj, vel, loss,
                      bls_lr, minimized=frozen)
    back = lambda x: np.moveaxis(np.asarray(x), 0, 1)
    np.testing.assert_array_equal(back(out.new_alpha), np.asarray(alpha))
    np.testing.assert_array_equal(back(out.new_grad), np.asarray(grad))
    np.testing.assert_array_equal(np.asarray(out.new_loss)[0], np.asarray(loss))
    np.testing.assert_array_equal(np.asarray(out.new_lr)[0], np.asarray(bls_lr))


def test_pallas_step_iterated_descends(setup):
    """Run several fused steps; the loss must descend like the XLA loop."""
    cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr = setup
    state = (alpha, grad, traj, vel, loss, bls_lr)
    losses = [float(loss.mean())]
    for _ in range(3):
        out = _run_pallas(cfg, basis, fs, pen, *state)
        back = lambda x: jnp.moveaxis(x, 0, 1)
        state = (back(out.new_alpha), back(out.new_grad), back(out.new_traj),
                 back(out.new_vel), out.new_loss[0], out.new_lr[0])
        losses.append(float(out.new_loss[0].mean()))
    assert losses[-1] < losses[0]


def test_pallas_eval_matches_xla(setup):
    cfg, basis, fs, pen, alpha, grad, traj, vel, loss, bls_lr = setup
    tr = lambda x: jnp.moveaxis(x, 1, 0).copy()
    out = pallas_step.cost_grad_eval(
        cfg, basis.kv, basis.kv.T, basis.mix, tr(alpha),
        pen.lambda_sg[None], pen.lambda_jl[None],
        fs.start, fs.goal,
        fs.obstacles[:, 0, :], fs.obstacles[:, 1, :], fs.obstacle_weight,
        interpret=True,
    )
    back = lambda x: np.moveaxis(np.asarray(x), 0, 1)
    np.testing.assert_allclose(np.asarray(out.loss)[0], np.asarray(loss),
                               rtol=2e-3)
    np.testing.assert_allclose(back(out.grad), np.asarray(grad),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(back(out.traj), np.asarray(traj),
                               rtol=1e-3, atol=2e-2)
