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

Numerical note: the answer is BITWISE invariant to the shard count and to
the kernel tile height (HALO=3 covers the physics epilogue's full south
stencil chain, GX=3 the lon lane chain, and the single-device packed path
runs the same wall_mask kernel program — see the HALO comment in
kernels/fused_substep.py). Two residual ulp-level caveats, both
XLA-program-level (FMA/fusion differences between distinct compiled
programs), not seam handling: (a) lon-sharded runs use the wrap_lon=False
kernel variant and differ from the single-device run by ~1 ulp/step;
(b) the halo-overlap schedule's seam-strip kernels are separate programs
and differ from the blocking schedule at the same level.
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
                                     pick_block_rows, row_pad)
from ..kernels.packing import pack_aux, pack_full, unpack_full
from ..physics.packed import radiation_step_packed
from .mesh import LAT, LON, validate_divisibility
from .sharding import forcing_pspec, grid_pspec, state_pspec


def refresh_cols(x, *, nx_l: int, n_lon: int):
    """Refresh the packed GX lon ghost columns of ``x`` (NYP, K, NXP) from
    the periodic lon ring (ppermute wraparound). Single-shard lon is a
    no-op: the kernel's own wrap maintenance is the global semantics."""
    if n_lon <= 1:
        return x
    east_real = x[..., nx_l:GX + nx_l]                # lanes GX+nx_l-GX ..
    west_real = x[..., GX:2 * GX]
    fwd = [(j, (j + 1) % n_lon) for j in range(n_lon)]
    bwd = [(j, (j - 1) % n_lon) for j in range(n_lon)]
    from_west = jax.lax.ppermute(east_real, LON, fwd)
    from_east = jax.lax.ppermute(west_real, LON, bwd)
    return jnp.concatenate(
        [from_west, x[..., GX:GX + nx_l], from_east,
         x[..., 2 * GX + nx_l:]], axis=-1)


def lat_edges(x, *, ny_l: int, n_lat: int):
    """ppermute the lat ghost-row payloads of ``x``: returns
    ``(from_south (HALO rows), from_north (HALO_N rows))`` with polar-edge
    shards falling back to their existing (kernel-written wall) ghosts.
    These permutes touch only the edge-row slices, so a consumer that does
    not need them (the interior of the fused kernel) stays independent —
    XLA overlaps the collective with that compute (halo_overlap mode)."""
    lat_idx = jax.lax.axis_index(LAT)
    send_up = x[ny_l:HALO + ny_l]                     # top HALO real rows
    send_dn = x[HALO:HALO + HALO_N]                   # bottom HALO_N real rows
    up = [(j, j + 1) for j in range(n_lat - 1)]
    dn = [(j + 1, j) for j in range(n_lat - 1)]
    from_south = jax.lax.ppermute(send_up, LAT, up)
    from_north = jax.lax.ppermute(send_dn, LAT, dn)
    south = jnp.where(lat_idx == 0, x[0:HALO], from_south)
    north = jnp.where(lat_idx == n_lat - 1,
                      x[HALO + ny_l:HALO + ny_l + HALO_N], from_north)
    return south, north


def apply_lat(x, south, north, *, ny_l: int):
    """Splice exchanged lat ghost rows into the packed array."""
    return jnp.concatenate(
        [south, x[HALO:HALO + ny_l], north, x[HALO + ny_l + HALO_N:]],
        axis=0)


def refresh_ghosts(x, *, ny_l: int, nx_l: int, n_lat: int, n_lon: int,
                   cols: bool = True):
    """Blocking refresh of all packed ghosts (lon cols + lat rows): the
    non-overlapped schedule, and the setup path for static aux arrays."""
    if cols:
        x = refresh_cols(x, nx_l=nx_l, n_lon=n_lon)
    if n_lat > 1:
        x = apply_lat(x, *lat_edges(x, ny_l=ny_l, n_lat=n_lat), ny_l=ny_l)
    return x


def make_packed_sharded_runner(cfg: ModelConfig, mesh, grid: Grid,
                               n_steps: int = 1):
    """Jitted ``run(state, grid, forcing) -> state`` advancing ``n_steps``
    on the packed fused-kernel path inside ONE shard_map region (pack/unpack
    at the chunk boundary; per-substep ghost refresh is the only
    communication).

    HALO OVERLAP (``cfg.sharding.halo_overlap``, SURVEY.md §5 long-context
    row; BASELINE config #4 "with halo-overlap"): instead of splicing the
    lat ghost rows into the input before the kernel (which serializes
    ppermute -> kernel), the main kernel launches on the STALE-ghost input —
    making it data-independent of the lat ppermutes, which XLA then runs
    concurrently — and two tiny seam-strip kernels recompute the only
    output rows the stale ghosts can influence (south NY_S=2, north NY_N=3,
    the kernel's halo radii) from the freshly exchanged rows; the outputs
    are spliced.

    Lon ghost columns stay on the blocking path — a measured+modeled
    decision (round 3, VERDICT r2 #6): at square shards the lon payload is
    comparable to the lat payload (~1.4x: 2*GX*NYP*(kp+kr) both directions
    vs (HALO+HALO_N)*(kp+kr)*NXP), but its blocking cost on real ICI is
    ~20 us/substep (~1.5% of the config-4 step) while a lon seam-strip
    kernel would be 128-lane padded for a ~14-lane strip (~25% extra
    compute at 0.5-deg shards) — strictly worse. The virtual-CPU-mesh
    A/B measurement cannot resolve the effect (removing the lon exchange
    measured SLOWER by 11% — shared-core noise exceeds the signal);
    docs/STATUS.md carries the numbers."""
    from ..core.config import check_rad_resolved
    from ..model import check_pallas_dtype, phys_epilogue_tuple

    check_rad_resolved(cfg)
    check_pallas_dtype(cfg)
    validate_divisibility(cfg, mesh)
    gc, num, phys = cfg.grid, cfg.numerics, cfg.physics
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    n_lat, n_lon = mesh.shape[LAT], mesh.shape[LON]
    ny_l, nx_l = ny // n_lat, nx // n_lon
    grid_np = make_grid(gc, num, np_mode=True)
    dtype = jnp.dtype(cfg.dtype)
    phys_tuple = phys_epilogue_tuple(cfg)
    with_phys = phys_tuple is not None
    bj = pick_block_rows(nz, ny_l, nx_l, same_base=False,
                         with_rad=phys.radiation, itemsize=dtype.itemsize,
                         with_phys=with_phys)
    kw = dict(dy=float(grid_np.dy), ptop=gc.ptop,
              with_rad=phys.radiation,
              with_diff=bool(num.diff_uv or num.diff_pott or num.diff_moist),
              dtype=dtype,
              interpret=jax.default_backend() == "cpu",
              wrap_lon=(n_lon == 1), wall_mask=(n_lat > 1))
    pred_k = make_fused_substep_packed(nz, ny_l, nx_l, bj=bj,
                                       same_base=True, **kw)
    corr_k = make_fused_substep_packed(nz, ny_l, nx_l, bj=bj,
                                       same_base=False, phys=phys_tuple, **kw)
    corr_radf = phys.radiation or with_phys
    refresh = functools.partial(refresh_ghosts, ny_l=ny_l, nx_l=nx_l,
                                n_lat=n_lat, n_lon=n_lon)
    r_cols = functools.partial(refresh_cols, nx_l=nx_l, n_lon=n_lon)
    edges = functools.partial(lat_edges, ny_l=ny_l, n_lat=n_lat)

    NY_S, NY_N = HALO, HALO_N          # seam widths = the kernel halo radii
    overlap = bool(cfg.sharding.halo_overlap) and n_lat > 1
    if overlap:
        if ny_l < NY_S + NY_N:
            raise ValueError(
                f"halo_overlap needs ny/mesh_lat >= {NY_S + NY_N} rows per "
                f"shard (got {ny_l})")
        pred_s = make_fused_substep_packed(nz, NY_S, nx_l, bj=NY_S,
                                           same_base=True, **kw)
        pred_n = make_fused_substep_packed(nz, NY_N, nx_l, bj=NY_N,
                                           same_base=True, **kw)
        corr_s = make_fused_substep_packed(nz, NY_S, nx_l, bj=NY_S,
                                           same_base=False, phys=phys_tuple,
                                           **kw)
        corr_n = make_fused_substep_packed(nz, NY_N, nx_l, bj=NY_N,
                                           same_base=False, phys=phys_tuple,
                                           **kw)

    def s_in(x, fresh_south):
        """South seam-strip packed input: fresh ghosts + local context rows
        (rows_pad(NY_S, NY_S) = HALO + NY_S + HALO_N rows)."""
        return jnp.concatenate(
            [fresh_south, x[HALO:HALO + NY_S + HALO_N]], axis=0)

    def n_in(x, fresh_north):
        """North seam-strip packed input (context + real + fresh ghosts)."""
        return jnp.concatenate(
            [x[HALO + ny_l - NY_N - HALO:HALO + ny_l], fresh_north], axis=0)

    def merge(out_main, out_s, out_n):
        """Splice seam-strip outputs (incl. their wall-ghost maintenance)
        over the stale-influenced rows of the main kernel output."""
        return jnp.concatenate([
            out_s[:HALO + NY_S],
            out_main[HALO + NY_S:HALO + ny_l - NY_N],
            out_n[HALO:HALO + NY_N + HALO_N],
            out_main[HALO + ny_l + HALO_N:],
        ], axis=0)

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
        if overlap:
            # static strip slices (ghost rows already hold true neighbors)
            a2_s, a2_n = aux.aux2[:HALO + NY_S + HALO_N], \
                n_in(aux.aux2, aux.aux2[HALO + ny_l:HALO + ny_l + HALO_N])
            geo_s = aux.geo[:HALO + NY_S + HALO_N]
            geo_n = n_in(aux.geo, aux.geo[HALO + ny_l:HALO + ny_l + HALO_N])

        dt = g.dt                          # runtime scalar (SMEM operand)

        def body_blocking(s, _):
            if phys.radiation:
                s = radiation_step_packed(s, aux, cfg, nz)
            prog = refresh(s.prog)
            radf = refresh(s.radf) if corr_radf else s.radf
            pred_args = (prog,) + ((radf,) if phys.radiation else ())
            p = refresh(pred_k(*pred_args, aux.aux2, aux.geo, aux.vert, dt))
            corr_args = (p, prog) + ((radf,) if corr_radf else ())
            out = corr_k(*corr_args, aux.aux2, aux.geo, aux.vert, dt)
            return s.replace(prog=out, t=s.t + dt, step=s.step + 1), None

        def body_overlap(s, _):
            if phys.radiation:
                s = radiation_step_packed(s, aux, cfg, nz)
            prog = r_cols(s.prog)
            radf = r_cols(s.radf) if corr_radf else s.radf
            # ---- predictor: seam ppermutes || main kernel ----
            fs_p, fn_p = edges(prog)
            fs_r, fn_r = edges(radf) if corr_radf else (None, None)
            rad_m = (radf,) if phys.radiation else ()
            rad_s = (s_in(radf, fs_r),) if phys.radiation else ()
            rad_n = (n_in(radf, fn_r),) if phys.radiation else ()
            p_main = pred_k(prog, *rad_m, aux.aux2, aux.geo, aux.vert, dt)
            p_s = pred_s(s_in(prog, fs_p), *rad_s, a2_s, geo_s, aux.vert, dt)
            p_n = pred_n(n_in(prog, fn_p), *rad_n, a2_n, geo_n, aux.vert, dt)
            p = r_cols(merge(p_main, p_s, p_n))
            # ---- corrector: same schedule; base rows reuse fs_p/fn_p ----
            fs_q, fn_q = edges(p)
            rad_mc = (radf,) if corr_radf else ()
            rad_sc = (s_in(radf, fs_r),) if corr_radf else ()
            rad_nc = (n_in(radf, fn_r),) if corr_radf else ()
            out_main = corr_k(p, prog, *rad_mc, aux.aux2, aux.geo, aux.vert,
                              dt)
            out_s = corr_s(s_in(p, fs_q), s_in(prog, fs_p), *rad_sc,
                           a2_s, geo_s, aux.vert, dt)
            out_n = corr_n(n_in(p, fn_q), n_in(prog, fn_p), *rad_nc,
                           a2_n, geo_n, aux.vert, dt)
            out = merge(out_main, out_s, out_n)
            return s.replace(prog=out, t=s.t + dt, step=s.step + 1), None

        body = body_overlap if overlap else body_blocking
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
