"""Receding-horizon replanning with warm starts under a real-time budget.

The reference achieves 50 Hz single-scene replanning by keeping the
environment a runtime input (ref: README.md:25-26, blog-post.html:232); every
solve restarts from the smoothstep fit (ref: trajectory.py:73-78).  This
module generalizes that into an explicit replanning loop (BASELINE.json
configs[3]):

* obstacles/start/goal change every tick with NO recompilation,
* warm start from the previous solution's alpha (falling back to the
  smoothstep fit on the first tick or after a reset),
* bounded latency: the solver runs with capped iteration horizons
  (``budget_*`` fields), trading optimality for a deterministic tick time,
* works batched: a fleet of arms replans in one device program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PlannerConfig
from ..models.rkhs import Basis, init_alpha, make_basis
from ..ops.scenario import Scenario
from .batched import solve_batch
from .common import SolveResult


@dataclasses.dataclass
class Replanner:
    """Stateful replanning driver around the stateless solvers.

    Args:
      cfg: base planner config; iteration caps are overridden by the budget
        caps below for per-tick solves.
      budget_outer/budget_inner: iteration horizons per tick.  Small caps +
        warm starts give bounded per-tick latency; constraint penalties keep
        escalating across ticks through re-solving.
      solver: 'bls' or 'gd'.
    """

    cfg: PlannerConfig
    budget_outer: int = 2
    budget_inner: int = 25
    solver: str = "bls"
    batched: bool = False
    engine: str = "vmap"
    backend: str = "xla"

    def __post_init__(self):
        self.tick_cfg = self.cfg.replace(
            max_outer_iteration=min(self.budget_outer, self.cfg.max_outer_iteration),
            max_inner_iteration=self.budget_inner,
        )
        self.basis = make_basis(self.tick_cfg)
        self._alpha: Optional[jnp.ndarray] = None

        cfg, basis = self.tick_cfg, self.basis

        if self.batched:
            if self.engine == "fleet":
                from .fleet import fleet_solve

                solver_name, backend = self.solver, self.backend

                @jax.jit
                def _solve(scn: Scenario, alpha0) -> SolveResult:
                    return fleet_solve(
                        cfg, basis, scn, alpha0, solver=solver_name,
                        backend=backend,
                    )
            else:
                @jax.jit
                def _solve(scn: Scenario, alpha0) -> SolveResult:
                    return solve_batch(
                        cfg, basis, scn, alpha0, solver=self.solver
                    )

            @jax.jit
            def _init(scn: Scenario):
                return jax.vmap(lambda s: init_alpha(cfg, basis, s.start, s.goal))(scn)
        else:
            from . import bls as _bls
            from . import gd as _gd

            fn = {"bls": _bls.solve, "gd": _gd.solve}[self.solver]

            @jax.jit
            def _solve(scn: Scenario, alpha0) -> SolveResult:
                return fn(cfg, basis, scn, alpha0)

            @jax.jit
            def _init(scn: Scenario):
                return init_alpha(cfg, basis, scn.start, scn.goal)

        self._solve_fn = _solve
        self._init_fn = _init

    def reset(self) -> None:
        """Drop the warm start (next tick refits the smoothstep init)."""
        self._alpha = None

    def plan(self, scn: Scenario) -> SolveResult:
        """One replanning tick: solve ``scn`` warm-started from the previous
        tick's solution.  The first tick (or after reset) initializes from
        the smoothstep fit."""
        alpha0 = self._alpha if self._alpha is not None else self._init_fn(scn)
        result = self._solve_fn(scn, alpha0)
        self._alpha = result.alpha
        return result
