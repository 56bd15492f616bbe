"""PartitionSpecs + placement helpers for the model pytrees.

Maps every State/Grid/Forcing leaf to its PartitionSpec for the
``('lat','lon')`` mesh (SURVEY.md §5 long-context row: the horizontal grid is
the model's "long dimension"; 3-D fields shard as (None, 'lat', 'lon')).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.grid import Grid
from ..core.state import Forcing, State
from .mesh import LAT, LON

# Grid leaves by sharded dimension.
_GRID_LAT_FIELDS = {"lat", "lats", "dx", "dxs", "area", "area_u", "area_v",
                    "corf", "corf_v", "tan_lat", "tan_lat_v",
                    "kdiff_uv", "kdiff_pott", "kdiff_moist"}
_GRID_LON_FIELDS = {"lon", "lonu"}


def state_pspec() -> State:
    """State-shaped pytree of PartitionSpecs (3-D: (None, lat, lon);
    2-D: (lat, lon); scalars replicated)."""
    def spec_for(name):
        if name in ("t", "step"):
            return P()
        if name in ("colp", "tsurf", "rain", "soil_moist",
                    "swflx_sfc", "lwflx_sfc"):
            return P(LAT, LON)
        return P(None, LAT, LON)

    return State(**{f.name: spec_for(f.name)
                    for f in dataclasses.fields(State)})


def forcing_pspec() -> Forcing:
    return Forcing(**{f.name: P(LAT, LON)
                      for f in dataclasses.fields(Forcing)})


def grid_pspec(grid: Grid) -> Grid:
    def spec_for(name):
        if name in _GRID_LAT_FIELDS:
            return P(LAT)
        if name in _GRID_LON_FIELDS:
            return P(LON)
        return P()

    kw = {f.name: spec_for(f.name)
          for f in dataclasses.fields(Grid) if not f.metadata.get("static")}
    return dataclasses.replace(grid, **kw)


def _to_shardings(mesh, pspec_tree):
    return jax.tree.map(lambda p: NamedSharding(mesh, p), pspec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_inputs(mesh, state: State, grid: Grid, forcing: Forcing):
    """device_put the model pytrees onto the mesh with their canonical
    shardings (GSPMD 'auto' mode entry point; also used to pre-place inputs
    for the shard_map path)."""
    state = jax.device_put(state, _to_shardings(mesh, state_pspec()))
    forcing = jax.device_put(forcing, _to_shardings(mesh, forcing_pspec()))
    grid = jax.device_put(grid, _to_shardings(mesh, grid_pspec(grid)))
    return state, grid, forcing
