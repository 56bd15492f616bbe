"""Fused Pallas kernels x shard_map: packed-supertensor domain decomposition.

Composes the fused substep kernel (kernels/fused_substep.py) with the 2-D
('lat','lon') device mesh: each shard holds shard-LOCAL packed supertensors
(kernels/packing.py layout on the local block), and the packed ghost
rows/columns — which the kernel maintains as walls/periodic-wrap in the
single-device case — are refreshed from ring neighbors with
``jax.lax.ppermute`` between kernel launches:

    per step:  radiation (interval, column-local, per shard)
               -> refresh(prog, radf)           [ppermute lat rows, lon cols]
               -> fused predictor kernel
               -> refresh(predicted)
               -> fused corrector kernel (physics epilogue inside)

The periodic lon seam is the natural ring wraparound; the lat chain is
open: polar-edge shards keep the kernel-written wall ghosts (clamp rows,
zero-v) and receive nothing. The kernel runs with ``wrap_lon=False`` on
multi-lon meshes (its output ghost columns belong to neighbors) and
``wall_mask=True`` on multi-lat meshes (the v polar wall exists only on
edge shards; the mask rides in AUX2 slot 4).

This is the TPU-native replacement for the halo machinery the reference
lacks (SURVEY.md §2.2 domain-decomposition row; §5 long-context row), on
the packed fast path: communication per substep is exactly the HALO/HALO_N
ghost rows and GX ghost columns of each supertensor, riding ICI inside a
slice and DCN across hosts.

Numerical note: sharded == unsharded holds to ~1e-9 (fp64, few steps), not
bitwise — the kernel's tile-seam halo clamp produces O(1e-10) differences
in second-order surface-drag terms at tile/shard boundaries (see the probe
history in docs/STATUS.md); this is far below fp32 roundoff on the
production path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.grid import Grid, make_grid
from ..core.state import Forcing, State
from ..kernels.fused_substep import (GX, HALO, HALO_N, lane_pad,
                                     make_fused_substep_packed,
                                     pick_block_rows, require_uniform_sigma,
                                     row_pad)
from ..kernels.packing import pack_aux, pack_full, unpack_full
from ..physics.packed import radiation_step_packed
from .mesh import LAT, LON, validate_divisibility
from .sharding import forcing_pspec, grid_pspec, state_pspec


def refresh_ghosts(x, *, ny_l: int, nx_l: int, n_lat: int, n_lon: int,
                   cols: bool = True):
    """Refresh the packed ghost rows/columns of a shard-local packed array
    ``x`` (NYP, K, NXP) from mesh neighbors.

    Lon: periodic ring — west ghosts get the west neighbor's easternmost GX
    real columns and vice versa. Lat: open chain — south ghosts get the
    south neighbor's top HALO real rows, north ghosts the north neighbor's
    bottom HALO_N real rows; polar-edge shards keep their existing
    (kernel-written wall) ghosts. Single-shard axes are skipped: the
    kernel's own wrap/wall maintenance is already the global semantics."""
    if cols and n_lon > 1:
        east_real = x[..., nx_l:GX + nx_l]            # lanes GX+nx_l-GX ..
        west_real = x[..., GX:2 * GX]
        fwd = [(j, (j + 1) % n_lon) for j in range(n_lon)]
        bwd = [(j, (j - 1) % n_lon) for j in range(n_lon)]
        from_west = jax.lax.ppermute(east_real, LON, fwd)
        from_east = jax.lax.ppermute(west_real, LON, bwd)
        x = jnp.concatenate(
            [from_west, x[..., GX:GX + nx_l], from_east,
             x[..., 2 * GX + nx_l:]], axis=-1)
    if n_lat > 1:
        lat_idx = jax.lax.axis_index(LAT)
        send_up = x[ny_l:HALO + ny_l]                 # top HALO real rows
        send_dn = x[HALO:HALO + HALO_N]               # bottom HALO_N real rows
        up = [(j, j + 1) for j in range(n_lat - 1)]
        dn = [(j + 1, j) for j in range(n_lat - 1)]
        from_south = jax.lax.ppermute(send_up, LAT, up)
        from_north = jax.lax.ppermute(send_dn, LAT, dn)
        south = jnp.where(lat_idx == 0, x[0:HALO], from_south)
        north = jnp.where(lat_idx == n_lat - 1,
                          x[HALO + ny_l:HALO + ny_l + HALO_N], from_north)
        x = jnp.concatenate(
            [south, x[HALO:HALO + ny_l], north, x[HALO + ny_l + HALO_N:]],
            axis=0)
    return x


def make_packed_sharded_runner(cfg: ModelConfig, mesh, grid: Grid,
                               n_steps: int = 1):
    """Jitted ``run(state, grid, forcing) -> state`` advancing ``n_steps``
    on the packed fused-kernel path inside ONE shard_map region (pack/unpack
    at the chunk boundary; per-substep ghost refresh is the only
    communication)."""
    from ..model import phys_epilogue_tuple

    validate_divisibility(cfg, mesh)
    gc, num, phys = cfg.grid, cfg.numerics, cfg.physics
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    n_lat, n_lon = mesh.shape[LAT], mesh.shape[LON]
    ny_l, nx_l = ny // n_lat, nx // n_lon
    grid_np = make_grid(gc, num, np_mode=True)
    require_uniform_sigma(grid_np.sigma_vb)
    dtype = jnp.dtype(cfg.dtype)
    phys_tuple = phys_epilogue_tuple(cfg)
    with_phys = phys_tuple is not None
    bj = pick_block_rows(nz, ny_l, nx_l, same_base=False,
                         with_rad=phys.radiation, itemsize=dtype.itemsize,
                         with_phys=with_phys)
    kw = dict(dt=float(grid_np.dt), dy=float(grid_np.dy), ptop=gc.ptop,
              with_rad=phys.radiation,
              diff_uv=num.diff_uv, diff_pott=num.diff_pott,
              diff_moist=num.diff_moist, dtype=dtype,
              interpret=jax.default_backend() == "cpu",
              wrap_lon=(n_lon == 1), wall_mask=(n_lat > 1))
    pred_k = make_fused_substep_packed(nz, ny_l, nx_l, bj=bj,
                                       same_base=True, **kw)
    corr_k = make_fused_substep_packed(nz, ny_l, nx_l, bj=bj,
                                       same_base=False, phys=phys_tuple, **kw)
    dt = float(grid_np.dt)
    corr_radf = phys.radiation or with_phys
    refresh = functools.partial(refresh_ghosts, ny_l=ny_l, nx_l=nx_l,
                                n_lat=n_lat, n_lon=n_lon)

    def local_run(state: State, g: Grid, forcing: Forcing) -> State:
        nyp, nxp = row_pad(ny_l, bj), lane_pad(nx_l)
        aux = pack_aux(forcing, g, bj, dtype)
        if n_lat > 1:
            # v polar-wall mask into AUX2 slot 4: global v row = 0 (south
            # wall) and >= ny (north wall face + beyond) are walls.
            lat_idx = jax.lax.axis_index(LAT)
            grow = lat_idx * ny_l + jnp.arange(nyp) - HALO
            mask = ((grow > 0) & (grow < ny)).astype(dtype)[:, None, None]
            mask = jnp.broadcast_to(mask, (nyp, 1, nxp))
            aux2 = jnp.concatenate(
                [aux.aux2[:, :4], mask, aux.aux2[:, 5:]], axis=1)
        else:
            aux2 = aux.aux2
        # static packed forcing/geometry: interior shards need true neighbor
        # values in their ghost rows/cols (hsurf feeds the geopotential at
        # halo rows; geo rows are per-latitude metric terms)
        aux = dataclasses.replace(aux, aux2=refresh(aux2),
                                  geo=refresh(aux.geo, cols=False))
        ps = pack_full(state, bj)

        def body(s, _):
            if phys.radiation:
                s = radiation_step_packed(s, aux, cfg, nz)
            prog = refresh(s.prog)
            radf = refresh(s.radf) if corr_radf else s.radf
            pred_args = (prog,) + ((radf,) if phys.radiation else ())
            p = refresh(pred_k(*pred_args, aux.aux2, aux.geo))
            corr_args = (p, prog) + ((radf,) if corr_radf else ())
            out = corr_k(*corr_args, aux.aux2, aux.geo)
            return s.replace(prog=out, t=s.t + dt, step=s.step + 1), None

        ps, _ = jax.lax.scan(body, ps, None, length=n_steps)
        return unpack_full(ps, state, nz, ny_l, nx_l)

    sspec = state_pspec()
    sharded = jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(sspec, grid_pspec(grid), forcing_pspec()),
        out_specs=sspec,
        check_vma=False,
    )
    return jax.jit(sharded)
