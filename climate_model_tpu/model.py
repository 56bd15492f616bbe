"""Full model step: dynamics + operator-split physics + time bookkeeping.

TPU-native rebuild of the reference driver loop in ``solver.py`` (SURVEY.md
§3.1 hot loop #0: dt -> dynamics step -> radiation on its interval -> surface
-> microphysics/turbulence -> diagnostics). Design departures (§7.1): the
whole step is one jitted pure function ``step(state, grid, forcing) ->
state``; the radiation interval is a branchless on-device ``lax.cond`` on the
step counter instead of a host-side ``if``; runs are driven in ``lax.scan``
chunks with diagnostics fetched every chunk (io/metrics.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from .core.config import ModelConfig
from .core.grid import Grid
from .core.state import Forcing, State
from .dycore.stepper import dynamics_step_fn, run_scan
from .physics.microphysics import microphysics_step
from .physics.radiation import radiation_step
from .physics.surface import surface_step
from .physics.turbulence import turbulence_step


def make_step_fn(cfg: ModelConfig) -> Callable[[State, Grid, Forcing], State]:
    """Build the full per-step function for ``cfg`` (all switches static)."""
    dyn_step = dynamics_step_fn(cfg)
    phys = cfg.physics

    any_split = phys.surface or phys.turbulence or phys.microphysics

    def step(state: State, grid: Grid, forcing: Forcing) -> State:
        dt = grid.dt
        if phys.radiation:
            # Refresh the cached radiative heating on its interval; the
            # cache feeds the POTT tendency inside the dynamics step.
            state = radiation_step(state, grid, forcing, cfg)
        state = dyn_step(state, grid, forcing)
        if any_split:
            # COLP is fixed for the rest of the step: compute the Exner/
            # pressure diagnostics once and share across the physics splits
            # (exact — only POTT-dependent pieces are recomputed inside).
            from .dycore.operators import diagnose_pressure
            press = diagnose_pressure(state.colp, grid)
        if phys.surface:
            state = surface_step(state, grid, forcing, cfg, dt, press=press)
        if phys.turbulence:
            state = turbulence_step(state, grid, forcing, cfg, dt, press=press)
        if phys.microphysics:
            state = microphysics_step(state, grid, forcing.hsurf, cfg, dt,
                                      press=press)
        return state.replace(t=state.t + dt, step=state.step + 1)

    return step


def make_run_fn(cfg: ModelConfig, n_steps: int, donate: bool = True):
    """Jitted ``run(state, grid, forcing) -> state`` advancing n_steps.

    The state buffers are donated so long scans update in place in HBM.
    """
    step = make_step_fn(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run(state: State, grid: Grid, forcing: Forcing) -> State:
        return run_scan(step, state, grid, forcing, n_steps)

    return run
