"""On-device diagnostics + host-side step-line / JSONL metrics.

TPU-native rebuild of the reference's per-step console diagnostics
(``print_ts_info`` / ``IO_helper_functions.py``, SURVEY.md §2.1 NetCDF-output
row [C]: step, sim time, max |wind|, mean COLP, wall-clock stats) and the
Timer utility (SURVEY.md §5 tracing row).

Design departure (SURVEY.md §5 metrics row): diagnostics are computed
ON-DEVICE inside the jitted scan chunk and fetched every chunk — never a
per-step device->host sync; host side appends structured JSONL
(grid-points/s, step time) next to the human step line.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.state import State


class StepDiagnostics(NamedTuple):
    """Small on-device diagnostic pytree (all scalars)."""

    t: jnp.ndarray            # sim time [s]
    step: jnp.ndarray
    max_wind: jnp.ndarray     # max(|u|, |v|) [m/s]
    mean_colp: jnp.ndarray    # area-weighted [Pa]
    mean_tair_proxy: jnp.ndarray  # mass-weighted mean POTT [K]
    total_water: jnp.ndarray  # global precipitable water + rain [kg]
    nan_flag: jnp.ndarray     # True if any prognostic is non-finite


def diagnostics(state: State, grid: Grid) -> StepDiagnostics:
    area = grid.area[:, None]
    w = area / jnp.sum(area) / state.colp.shape[-1]
    mean_colp = jnp.sum(state.colp * w)
    dsig = grid.dsigma[:, None, None]
    mass = state.colp[None] * dsig
    mean_pott = jnp.sum(state.pott * mass * w[None]) / jnp.sum(mass * w[None])
    from ..core import constants as c
    water = jnp.sum((state.qv + state.qc) * mass * area[None]) / c.G \
        + jnp.sum(state.rain * area)
    max_wind = jnp.maximum(jnp.max(jnp.abs(state.u)), jnp.max(jnp.abs(state.v)))
    finite = jnp.isfinite(state.u).all() & jnp.isfinite(state.colp).all() \
        & jnp.isfinite(state.pott).all() & jnp.isfinite(state.qv).all()
    return StepDiagnostics(
        t=state.t, step=state.step, max_wind=max_wind, mean_colp=mean_colp,
        mean_tair_proxy=mean_pott, total_water=water,
        nan_flag=jnp.logical_not(finite))


@dataclasses.dataclass
class MetricsLogger:
    """Host-side step line + JSONL metrics (reference print_ts_info +
    SURVEY.md §5 'structured JSONL metrics')."""

    jsonl_path: Optional[str] = None
    grid_points: int = 0
    quiet: bool = False
    _t_last: float = dataclasses.field(default_factory=time.time)
    _step_last: int = 0

    def log_chunk(self, d: StepDiagnostics, extra: dict | None = None):
        now = time.time()
        step = int(d.step)
        wall = now - self._t_last
        nsteps = max(step - self._step_last, 1)
        gps = self.grid_points * nsteps / wall if wall > 0 else 0.0
        rec = dict(
            step=step, t_days=float(d.t) / 86400.0,
            max_wind=float(d.max_wind), mean_colp=float(d.mean_colp),
            mean_pott=float(d.mean_tair_proxy),
            total_water=float(d.total_water),
            nan=bool(d.nan_flag), wall_s=wall,
            grid_points_per_s=gps,
        )
        if extra:
            rec.update(extra)
        if not self.quiet:
            print(f"step {step:7d}  day {rec['t_days']:8.3f}  "
                  f"max|V| {rec['max_wind']:7.2f} m/s  "
                  f"COLP {rec['mean_colp']:9.1f} Pa  "
                  f"POTT {rec['mean_pott']:7.2f} K  "
                  f"{gps/1e6:8.2f} Mgp/s", flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        self._t_last = now
        self._step_last = step
        return rec
