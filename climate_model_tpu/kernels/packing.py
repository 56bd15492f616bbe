"""Packed-layout state: keep the model state in the fused kernel's
(lat, k, lon) lane-padded SUPERTENSOR layout ACROSS the whole scan.

Rationale (measured on v5e): per-step pack/unpack transposes+pads moved
~800 MB/step — more than the fused kernels themselves; and per-FIELD
streaming spent most of the step issuing ~29 thin DMAs per tile. With the
state held as the kernel's supertensors, pack/unpack happens once per scan
chunk, each substep is one kernel launch with O(1) DMA issues per tile, and
the interval physics (radiation) runs natively on packed slices.

Layout recap (kernels/fused_substep.py module docstring): arrays are
(NYP, K, NXP) with latitude on dim 0 (rows [HALO, HALO+ny) real, wall-ghost
rows each side, pad rows to NYP), K sublanes holding all fields
back-to-back (PROG: [colp|tsurf|rain|soilm|dead|u|v|pott|qv|qc]; RADF:
[sw|lw|dead|dpottdt_rad]; AUX2: [hsurf|land|albedo|evap|dead]), NXP lanes
with GX periodic wrap ghost columns each side and dead padding beyond.
Dead rows/columns/k-slots may hold garbage (even NaN); they are never read
by valid outputs and are dropped at unpack.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import Forcing, State
from .fused_substep import (GEO_FIELDS, GX, HALO, K2, lane_pad, make_vert,
                            pack2, pack_aux2, pack_geo, pack_prog,
                            pack_radf, row_pad, unpack2, unpack3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedState:
    """State pytree in the packed supertensor layout. ``nz`` is static
    metadata (the k extents are padded, so it is not recoverable from the
    array shapes)."""

    prog: jax.Array        # (NYP, prog_k(nz), NXP)
    radf: jax.Array        # (NYP, radf_k(nz), NXP)
    t: jax.Array
    step: jax.Array
    nz: int = dataclasses.field(metadata=dict(static=True), default=0)

    def replace(self, **kw) -> "PackedState":
        return dataclasses.replace(self, **kw)

    # --- packed-slice accessors (views for the interval physics) ---
    @property
    def colp(self):
        return self.prog[:, 0:1]

    @property
    def tsurf(self):
        return self.prog[:, 1:2]

    @property
    def rain(self):
        return self.prog[:, 2:3]

    @property
    def soil_moist(self):
        return self.prog[:, 3:4]

    @property
    def u(self):
        return self.prog[:, K2:K2 + self.nz]

    @property
    def v(self):
        return self.prog[:, K2 + self.nz:K2 + 2 * self.nz]

    @property
    def pott(self):
        return self.prog[:, K2 + 2 * self.nz:K2 + 3 * self.nz]

    @property
    def qv(self):
        return self.prog[:, K2 + 3 * self.nz:K2 + 4 * self.nz]

    @property
    def qc(self):
        return self.prog[:, K2 + 4 * self.nz:K2 + 5 * self.nz]

    @property
    def swflx_sfc(self):
        return self.radf[:, 0:1]

    @property
    def lwflx_sfc(self):
        return self.radf[:, 1:2]

    @property
    def dpottdt_rad(self):
        return self.radf[:, K2:K2 + self.nz]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedAux:
    """Static packed auxiliary fields (forcing + geometry)."""

    aux2: jax.Array       # (NYP, K2, NXP): [hsurf|land|albedo|evap|dead]
    geo: jax.Array        # (NYP, 1, NGEO)
    vert: jax.Array       # (1, nz+1, NVERT): per-level sigma geometry
    lat: jax.Array        # (NYP, 1, 1)
    lon: jax.Array        # (1, 1, NXP)
    valid: jax.Array      # (NYP, 1, NXP) 1.0 on real rows/cols else 0.0

    @property
    def hsurf(self):
        return self.aux2[:, 0:1]

    @property
    def land_mask(self):
        return self.aux2[:, 1:2]

    @property
    def albedo(self):
        return self.aux2[:, 2:3]

    @property
    def evap_eff(self):
        return self.aux2[:, 3:4]


def pack_full(state: State, bj: int) -> PackedState:
    nz = state.u.shape[0]
    return PackedState(
        prog=pack_prog(state.u, state.v, state.pott, state.qv, state.qc,
                       state.colp, state.tsurf, state.rain,
                       state.soil_moist, bj),
        radf=pack_radf(state.swflx_sfc, state.lwflx_sfc, state.dpottdt_rad,
                       bj),
        t=state.t, step=state.step, nz=nz)


def unpack_full(ps: PackedState, template: State, nz: int, ny: int,
                nx: int) -> State:
    return template.replace(
        u=unpack3(ps.u, nz, ny, nx), v=unpack3(ps.v, nz, ny, nx),
        pott=unpack3(ps.pott, nz, ny, nx), qv=unpack3(ps.qv, nz, ny, nx),
        qc=unpack3(ps.qc, nz, ny, nx), colp=unpack2(ps.colp, ny, nx),
        tsurf=unpack2(ps.tsurf, ny, nx), rain=unpack2(ps.rain, ny, nx),
        soil_moist=unpack2(ps.soil_moist, ny, nx),
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
    aux2 = pack_aux2(forcing.hsurf, forcing.land_mask, forcing.albedo,
                     forcing.evap_eff, bj)
    # v polar-wall mask into AUX2 slot 4 (wall_mask=True kernels): 1 on
    # interior v rows, 0 on the wall rows. Single-shard form of the
    # shard-aware mask in dist/packed_halo.py (which overwrites this slot),
    # so the single-device kernel runs the SAME program as the lat-sharded
    # one -> sharded == unsharded is bitwise by construction.
    grow = jnp.arange(nyp) - HALO
    mask = ((grow > 0) & (grow < ny)).astype(dtype)[:, None, None]
    aux2 = jnp.concatenate(
        [aux2[:, :4], jnp.broadcast_to(mask, (nyp, 1, nxp)), aux2[:, 5:]],
        axis=1)
    vert = make_vert(grid.sigma_vb, grid.dsigma, dtype)
    return PackedAux(aux2=aux2, geo=geo, vert=vert, lat=lat, lon=lon,
                     valid=valid)


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
