"""Shared solver machinery: state pytrees and the penalty-method outer loop.

Both optimizers (GD, BLS) share the reference's dual structure
(ref: optimizer_GD.py:172-232, optimizer_BLS.py:126-213):

    outer penalty loop (<= max_outer_iteration):
        inner descent loop (<= max_inner_iteration) minimizes the penalized
            cost until the per-step loss reduction drops below tolerance
        check hard constraints; on violation multiply the penalty weights
            by lambda_constraint_increase and repeat

We implement the outer/inner loops ONCE, parameterized by an inner-step
function, in two execution modes:

* ``fixed_iters=False`` — ``lax.while_loop`` with early exit, matching the
  reference's latency-oriented single-scenario behavior,
* ``fixed_iters=True`` — ``lax.fori_loop`` to the caps with per-lane "done"
  masking (updates are frozen once converged).  Fixed horizons batch and
  shard with no divergence stragglers; this is the throughput mode the
  north-star metric measures.

Under ``jax.vmap`` the while_loop condition becomes a lane-reduction
(`any lane still active`), and finished lanes are frozen by the same masks,
so batched early-exit semantics equal the per-lane sequential semantics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PlannerConfig
from ..models.rkhs import Basis
from ..ops.costs import Penalty, constraints_fulfilled
from ..ops.scenario import Scenario


def freeze_when(done, state, new_state):
    """Select old state where ``done`` — makes loop bodies no-ops for lanes
    that already converged.  Crucial under vmap: a vmapped while_loop keeps
    running every lane until ALL lanes exit, so bodies must be idempotent for
    finished lanes or batched semantics diverge from sequential semantics."""
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(done, old, new), state, new_state
    )


class SolveStats(NamedTuple):
    """Telemetry returned with every solve (the reference only printed these,
    ref: main.py:126-143)."""

    outer_iters: jnp.ndarray   # i32 — penalty escalations actually used
    inner_iters: jnp.ndarray   # i32 — total descent steps across outer iters
    converged: jnp.ndarray     # bool — hard constraints fulfilled
    final_cost: jnp.ndarray    # f32 — penalized cost at the final penalty


class SolveResult(NamedTuple):
    alpha: jnp.ndarray
    stats: SolveStats


# An inner minimizer: (alpha, penalty) -> (alpha, inner_iters_used, final_loss)
InnerFn = Callable[[jnp.ndarray, Penalty], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


def inner_loop_bound(cfg: PlannerConfig, round_idx):
    """Inner-step budget for one penalty round.

    With ``cfg.inner_schedule`` set (fixed_iters mode) and a traced round
    index, returns the schedule entry for that round as a traced i32 — used
    as a ``fori_loop`` bound (lowers to a while_loop; the program stays
    rolled, only the trip count varies per round).  Otherwise returns the
    static ``max_inner_iteration`` cap."""
    if round_idx is None or cfg.inner_schedule is None:
        return cfg.max_inner_iteration
    sched = jnp.asarray(cfg.inner_schedule, jnp.int32)
    return sched[jnp.clip(round_idx, 0, len(cfg.inner_schedule) - 1)]


class _OuterState(NamedTuple):
    fulfilled: jnp.ndarray
    outer_iter: jnp.ndarray
    alpha: jnp.ndarray
    penalty: Penalty
    total_inner: jnp.ndarray
    final_loss: jnp.ndarray


def run_dual_loop(
    cfg: PlannerConfig,
    basis: Basis,
    scn: Scenario,
    alpha0: jnp.ndarray,
    inner_fn_for_outer: Callable[[jnp.ndarray], InnerFn],
    constraints_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    penalty0: Optional[Penalty] = None,
) -> SolveResult:
    """Penalty-method dual loop (ref: optimizer_BLS.py:183-211).

    ``inner_fn_for_outer(outer_iter)`` returns the inner minimizer for that
    outer iteration (GD reads its learning rate from a per-outer schedule,
    ref: optimizer_GD.py:209).  ``constraints_fn`` defaults to the
    single-scenario check; lane-parallel engines (fleet) pass a batched one
    returning (B,) — every piece of loop state then carries a trailing or
    leading lane axis and the freeze masks broadcast across it.
    """
    inc = jnp.float32(cfg.lambda_constraint_increase)
    if constraints_fn is None:
        constraints_fn = lambda a: constraints_fulfilled(cfg, basis, scn, a)

    def _raw_outer_body(state: _OuterState, round_idx=None) -> _OuterState:
        alpha, iters, loss = inner_fn_for_outer(state.outer_iter, round_idx)(
            state.alpha, state.penalty
        )
        fulfilled = constraints_fn(alpha)
        # On violation escalate both multipliers x increase
        # (ref: optimizer_BLS.py:201-202); on success freeze.
        new_penalty = Penalty(
            jnp.where(fulfilled, state.penalty.lambda_sg, state.penalty.lambda_sg * inc),
            jnp.where(fulfilled, state.penalty.lambda_jl, state.penalty.lambda_jl * inc),
        )
        return _OuterState(
            fulfilled=fulfilled,
            outer_iter=jnp.where(fulfilled, state.outer_iter, state.outer_iter + 1),
            alpha=alpha,
            penalty=new_penalty,
            total_inner=state.total_inner + iters,
            final_loss=loss,
        )

    def outer_body(state: _OuterState, round_idx=None) -> _OuterState:
        # Freeze fulfilled AND budget-exhausted lanes (no-op body) so
        # batched lockstep execution preserves per-lane sequential
        # semantics.  The exhaustion term is load-bearing: under a batched
        # early-exit while_loop the loop keeps running while ANY lane is
        # active, and without it an unfulfilled lane at
        # outer_iter == max_outer_iteration would receive EXTRA penalty
        # rounds (lambda escalations + inner descent) that the same scene
        # solved alone never gets — measured on 256 random scenes this
        # inflated the batched engine's converged fraction to 77% vs the
        # per-scene reference semantics' 53% (benchmarks/certify.py).
        done = jnp.logical_or(
            state.fulfilled, state.outer_iter >= cfg.max_outer_iteration
        )
        return freeze_when(done, state, _raw_outer_body(state, round_idx))

    if penalty0 is None:
        penalty0 = Penalty(
            jnp.float32(cfg.lambda_sg_constraint),
            jnp.float32(cfg.lambda_jl_constraint),
        )
    lane = jnp.zeros_like(penalty0.lambda_sg)  # scalar or (B,) lane prototype
    init = _OuterState(
        fulfilled=lane.astype(bool),
        outer_iter=lane.astype(jnp.int32),
        alpha=alpha0,
        penalty=penalty0,
        total_inner=lane.astype(jnp.int32),
        final_loss=jnp.full_like(lane, jnp.inf),
    )

    if cfg.fixed_iters:
        # Fixed horizon: always run max_outer_iteration rounds; fulfilled
        # lanes are frozen by the mask inside outer_body.
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
        alpha=final.alpha,
        stats=SolveStats(
            outer_iters=final.outer_iter,
            inner_iters=final.total_inner,
            converged=final.fulfilled,
            final_cost=final.final_loss,
        ),
    )
