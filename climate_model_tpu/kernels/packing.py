"""Packed-layout state: keep the model state in the fused kernel's
(lat, k, lon) lane-padded layout ACROSS the whole scan.

Rationale (measured on v5e): per-step pack/unpack transposes+pads moved
~800 MB/step — more than the fused kernels themselves. With the state held
packed, pack/unpack happens once per scan chunk and the physics splits run
natively on packed arrays (physics/packed.py).

Layout recap (kernels/fused_substep.py): arrays are (NYP, K, NXP) with
latitude on dim 0 (rows [HALO, HALO+ny) real, wall-ghost rows each side,
pad rows to NYP), K = nz levels (or 1 for 2-D fields), NXP lanes with GX
periodic wrap ghost columns each side and dead padding beyond. Dead
rows/columns may hold garbage (even NaN); they are never read by valid
outputs and are dropped at unpack.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import Forcing, State
from .fused_substep import (GEO_FIELDS, GX, HALO, lane_pad, pack2, pack3,
                            pack_geo, row_pad, unpack2, unpack3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedState:
    """State pytree in packed layout. 3-D fields (NYP, nz, NXP); 2-D fields
    (NYP, 1, NXP); scalars unchanged."""

    u: jax.Array
    v: jax.Array
    pott: jax.Array
    qv: jax.Array
    qc: jax.Array
    colp: jax.Array
    tsurf: jax.Array
    rain: jax.Array
    dpottdt_rad: jax.Array
    swflx_sfc: jax.Array
    lwflx_sfc: jax.Array
    t: jax.Array
    step: jax.Array

    def replace(self, **kw) -> "PackedState":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedAux:
    """Static packed auxiliary fields (forcing + geometry)."""

    hsurf: jax.Array      # (NYP, 1, NXP)
    land_mask: jax.Array
    albedo: jax.Array
    evap_eff: jax.Array
    geo: jax.Array        # (NYP, 1, NGEO)
    lat: jax.Array        # (NYP, 1, 1)
    lon: jax.Array        # (1, 1, NXP)
    valid: jax.Array      # (NYP, 1, NXP) 1.0 on real rows/cols else 0.0


def pack_full(state: State, bj: int) -> PackedState:
    return PackedState(
        u=pack3(state.u, bj), v=pack3(state.v, bj, zero_ghost=True),
        pott=pack3(state.pott, bj), qv=pack3(state.qv, bj),
        qc=pack3(state.qc, bj), colp=pack2(state.colp, bj),
        tsurf=pack2(state.tsurf, bj), rain=pack2(state.rain, bj),
        dpottdt_rad=pack3(state.dpottdt_rad, bj),
        swflx_sfc=pack2(state.swflx_sfc, bj),
        lwflx_sfc=pack2(state.lwflx_sfc, bj),
        t=state.t, step=state.step)


def unpack_full(ps: PackedState, template: State, nz: int, ny: int,
                nx: int) -> State:
    return template.replace(
        u=unpack3(ps.u, nz, ny, nx), v=unpack3(ps.v, nz, ny, nx),
        pott=unpack3(ps.pott, nz, ny, nx), qv=unpack3(ps.qv, nz, ny, nx),
        qc=unpack3(ps.qc, nz, ny, nx), colp=unpack2(ps.colp, ny, nx),
        tsurf=unpack2(ps.tsurf, ny, nx), rain=unpack2(ps.rain, ny, nx),
        dpottdt_rad=unpack3(ps.dpottdt_rad, nz, ny, nx),
        swflx_sfc=unpack2(ps.swflx_sfc, ny, nx),
        lwflx_sfc=unpack2(ps.lwflx_sfc, ny, nx),
        t=ps.t, step=ps.step)


def pack_aux(forcing: Forcing, grid, bj: int, dtype) -> PackedAux:
    ny, nx = forcing.hsurf.shape
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    geo = pack_geo(jnp.stack([getattr(grid, f) for f in GEO_FIELDS], axis=1),
                   bj)
    lat = pack_geo(grid.lat[:, None], bj)[:, :, :1]          # (NYP,1,1)
    lon = jnp.concatenate(
        [grid.lon[-GX:], grid.lon, grid.lon[:GX],
         jnp.zeros((nxp - nx - 2 * GX,), grid.lon.dtype)])[None, None, :]
    valid = jnp.zeros((nyp, 1, nxp), dtype)
    valid = valid.at[HALO:HALO + ny, :, GX:GX + nx].set(1.0)
    return PackedAux(
        hsurf=pack2(forcing.hsurf, bj), land_mask=pack2(forcing.land_mask, bj),
        albedo=pack2(forcing.albedo, bj), evap_eff=pack2(forcing.evap_eff, bj),
        geo=geo, lat=lat, lon=lon, valid=valid)


# ---------------------------------------------------------------------------
# Packed-layout shifts (jnp level; ghosts make the seam/walls static slices)
# ---------------------------------------------------------------------------

def p_east(x):
    """Value of the east (i+1) neighbor (lane shift; wrap via ghost cols)."""
    return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)


def p_west(x):
    return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)


def p_north(x):
    """Value of the j+1 row (row shift; wall via ghost rows)."""
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def p_south(x):
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def refresh_ghosts(x, ny: int, nx: int, zero_ghost_rows: bool = False):
    """Re-establish the periodic wrap columns and wall-ghost rows after an
    update that touched only the valid region (physics splits). 3-D and 2-D
    packed arrays alike ((NYP, K, NXP))."""
    x = x.at[..., 0:GX].set(x[..., nx:nx + GX])
    x = x.at[..., GX + nx:2 * GX + nx].set(x[..., GX:2 * GX])
    if zero_ghost_rows:
        x = x.at[0:HALO].set(0.0)
        x = x.at[HALO + ny:].set(0.0)
    else:
        x = x.at[0:HALO].set(jnp.broadcast_to(x[HALO:HALO + 1],
                                              (HALO,) + x.shape[1:]))
        x = x.at[HALO + ny:].set(
            jnp.broadcast_to(x[HALO + ny - 1:HALO + ny],
                             (x.shape[0] - HALO - ny,) + x.shape[1:]))
    return x
