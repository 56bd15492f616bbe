"""Explicit shard_map step with ppermute halo exchange.

The manually-scheduled counterpart of the GSPMD 'auto' path (SURVEY.md §5
long-context row): the full model step runs as ONE shard_map body; every
neighbor shift inside the operators fetches its 1-cell halo via
``jax.lax.ppermute`` (dycore/boundaries.py shard mode) — the periodic lon
seam is the natural ring wraparound, the polar walls are the open ends of
the lat chain (ppermute zero-fill + edge substitution on edge shards).

This is the structural cousin of ring-attention neighbor exchange
(SURVEY.md §2.2 SP/CP row). Halo/compute overlap (interior-first
scheduling, Pallas async remote DMA) layers on top of this entry point.
"""

from __future__ import annotations

import jax

from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import boundaries as bc
from ..dycore.stepper import run_scan
from ..model import make_step_fn
from .mesh import LAT, LON, validate_divisibility
from .sharding import forcing_pspec, grid_pspec, state_pspec


def make_sharded_step_fn(cfg: ModelConfig, mesh, grid: Grid,
                         n_steps: int = 1):
    """Build jitted ``run(state, grid, forcing) -> state`` advancing
    ``n_steps`` inside one shard_map region (the scan lives inside the
    shard_map, so the per-step halo ppermutes are the ONLY communication)."""
    validate_divisibility(cfg, mesh)
    step = make_step_fn(cfg)
    n_lat, n_lon = mesh.shape[LAT], mesh.shape[LON]

    def local_run(state: State, g: Grid, forcing: Forcing) -> State:
        with bc.shard_mode(LAT, LON, n_lat, n_lon):
            return run_scan(step, state, g, forcing, n_steps)

    sspec = state_pspec()
    sharded = jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(sspec, grid_pspec(grid), forcing_pspec()),
        out_specs=sspec,
        check_vma=False,
    )
    return jax.jit(sharded)
