"""Fused Pallas TPU kernel: one full dycore substep (tendencies + proceed).

This is the TPU-native equivalent of the reference's entire ``@cuda.jit``
dynamics kernel set — continuity + wind + temperature + moisture +
diagnostics + the mass-weighted update (reference files ``continuity_cuda.py``,
``wind_cuda.py``, ``temperature_cuda.py``, ``moisture.py``,
``geopotential_cuda.py``, ``diagnostics.py``, ``jacobson.py``'s
``proceed_timestep``; SURVEY.md §2.1 L4/L0) — fused into ONE HBM pass:

    reads  one prognostic SUPERTENSOR (eval) [+ the base supertensor for the
           Matsuno corrector] + radiation/flux supertensor + static 2-D
           supertensor (hsurf, land, albedo, evap) + per-lat geometry
    writes one prognostic supertensor (updated)

per substep, which is the HBM speed-of-light traffic floor (BASELINE.json
"fused Pallas stencil kernels ... speed-of-light HBM-bandwidth per chip";
bench/roofline.py implements the byte model).

## Packed supertensor layout

Mosaic constrains manual-DMA windows of HBM refs: lane extents must be
multiples of 128 and sublane offsets/extents multiples of 8 (measured
empirically on v5e), but the MAJOR dimension of a 3-D ref slices freely.
The kernel therefore runs on a packed layout

    packed[j, k, c] , shape (NYP, K, NXP)        (latitude is dim 0!)

with NXP = ceil((nx + 4)/128)*128 lanes: columns [GX, GX+nx) hold longitudes
0..nx-1, columns [0, GX) and [GX+nx, 2*GX+nx) hold the periodic wrap (GX=3
ghost columns each side — the lon seam becomes a static lane shift, no roll),
the rest is dead padding. Rows: [2, 2+ny) are the physical latitudes with
2 wall-ghost rows on each side (edge clamp; zeros for v) and optional dead
pad rows up to NYP.

ALL model fields ride in THREE supertensors (k is axis 1), so a latitude
tile is O(1) DMA issues instead of O(#fields) — at 1 deg the per-field
streaming variant spent most of the step issuing ~29 thin copies per tile:

    PROG (NYP, K2+pad8(5*nz), NXP): [colp | tsurf | rain | soilm | 4 dead |
                                     u(nz) | v(nz) | pott(nz) | qv | qc | pad]
    RADF (NYP, K2+pad8(nz),   NXP): [swflx_sfc | lwflx_sfc | 6 dead |
                                     dpottdt_rad(nz) | pad]
    AUX2 (NYP, K2,            NXP): [hsurf | land_mask | albedo | evap_eff |
                                     4 dead]

(K2 = 8 head slots; the 8-alignment makes every sub-window a legal Mosaic
sublane window: the corrector streams PROG's 2-D head at the full stencil
row window but the 3-D base fields — consumed only at the proceed stage —
at just the update rows.)

Latitude tiles of BJ rows stream through VMEM with a 3-row south halo
window (halo > 1 because COLP_new and WWIND are tile-local intermediates
with their own 1-row halo, and the physics epilogue consumes updated fields
one halo row deep — see the HALO constant's comment for the exact chain);
the eval supertensor and the output are
double-buffered (pallas_guide 'Patterns: Double Buffering'), corrector base
streams are single-buffered with deferred waits so their DMA overlaps the
tendency compute. The kernel maintains the ghost columns and wall-ghost rows
of its outputs, so packed substeps chain without re-packing; pack/unpack
(XLA transpose+concat) happens once per scan.

Scoped VMEM is raised via CompilerParams.vmem_limit_bytes
(CLIMATE_TPU_VMEM_LIMIT_MB, default 100 of the v5e's 128 MiB) so tiles can
be tall: input halo re-read amplification is (BJ+6)/BJ, i.e. 1.3 at BJ=20
vs 2.25 at the BJ=4 the old 16 MiB default forced.

The jnp operators in dycore/operators.py are the numerical oracle for this
kernel (tests/unit/test_pallas_substep.py, interpret mode, fp64).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as c

GEO_FIELDS = ("area", "area_v", "dx", "dxs", "corf", "corf_v",
              "tan_lat", "tan_lat_v", "kdiff_uv", "kdiff_pott",
              "kdiff_moist")
NGEO = len(GEO_FIELDS)
HALO = 3          # south row-halo (and ghost-row offset of the packed rows).
                  # 3, not 2: the physics epilogue consumes updated fields at
                  # the tile's south halo row, whose v-momentum chain reaches
                  # ce three rows south (tauy[g-1] <- v2[g-1] <- fyc_v[g-2]
                  # <- vflx[g-2] <- colp_v[g-2] <- ce[g-3]); with a 2-row
                  # halo the _s clamp at the window edge injected ~1e-13
                  # seam noise into the 2nd-order drag terms. 3 rows make
                  # every halo value the epilogue reads exact, so tile
                  # height, shard count, and overlap schedule are all
                  # bitwise-invariant.
HALO_N = 3        # north row-halo: +1 so the physics epilogue can read the
                  # north neighbor of updated fields (surface wind average)
GX = 3            # periodic ghost columns each side (3 for the same lane
                  # chain in sharded-lon mode: taux[lane-1] <- u2 <- uflx <-
                  # colp_u <- ce two lanes west of the innermost ghost; lanes
                  # are 128-padded so the extra column is free)
K2 = 8            # head slots of each supertensor (2-D fields + dead pad)


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def prog_k(nz: int) -> int:
    """Sublane extent of the prognostic supertensor."""
    return K2 + _pad8(5 * nz)


def radf_k(nz: int) -> int:
    """Sublane extent of the radiation/flux supertensor."""
    return K2 + _pad8(nz)


def lane_pad(nx: int) -> int:
    return -(-(nx + 2 * GX) // 128) * 128


NVERT = 2         # lanes of the per-level VERT operand: [sigma_vb | dsigma]


def make_vert(sigma_vb, dsigma, dtype):
    """Per-level geometry operand (1, nz+1, NVERT): sigma borders and layer
    thicknesses (dsigma padded with a trailing 0). Mosaic cannot capture
    array constants, so general ``sigma_vb``/``dsigma`` (incl. power-law
    stretched grids, ``GridConfig.sigma_stretch``) ride in as a tiny VMEM
    operand — the round-2 ``require_uniform_sigma`` refusal guard is gone.
    For uniform grids with power-of-two nz the stored values equal the old
    ``iota * dsig`` construction bitwise."""
    sv = jnp.asarray(sigma_vb, dtype)
    ds = jnp.concatenate([jnp.asarray(dsigma, dtype),
                          jnp.zeros((1,), dtype)])
    return jnp.stack([sv, ds], axis=-1)[None]               # (1, nz+1, 2)


def row_pad(ny: int, bj: int) -> int:
    nt = -(-ny // bj)
    return nt * bj + HALO + HALO_N


# ---------------------------------------------------------------------------
# Pack / unpack (XLA side; once per scan)
# ---------------------------------------------------------------------------

def pack3(x, bj: int, zero_ghost: bool = False):
    """(nz, ny, nx) -> (NYP, nz, NXP) packed (see module docstring)."""
    nz, ny, nx = x.shape
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    xt = jnp.transpose(x, (1, 0, 2))                        # (ny, nz, nx)
    xt = jnp.concatenate([xt[..., -GX:], xt, xt[..., :GX]], axis=-1)
    xt = jnp.concatenate(
        [xt, jnp.zeros((ny, nz, nxp - nx - 2 * GX), x.dtype)], axis=-1)
    if zero_ghost:
        south = jnp.zeros_like(xt[:HALO])
        north = jnp.zeros_like(xt[:1])
    else:
        south = jnp.broadcast_to(xt[:1], (HALO,) + xt.shape[1:])
        north = xt[-1:]
    north = jnp.broadcast_to(north, (nyp - ny - HALO,) + xt.shape[1:])
    return jnp.concatenate([south, xt, north], axis=0)


def pack2(x, bj: int, zero_ghost: bool = False):
    return pack3(x[None], bj, zero_ghost)                   # (NYP, 1, NXP)


def unpack3(xp, nz: int, ny: int, nx: int):
    """(NYP, nz, NXP) -> (nz, ny, nx)."""
    xt = xp[HALO:HALO + ny, :, GX:GX + nx]
    return jnp.transpose(xt, (1, 0, 2))


def unpack2(xp, ny: int, nx: int):
    return xp[HALO:HALO + ny, 0, GX:GX + nx]


def pack_prog(u, v, pott, qv, qc, colp, tsurf, rain, soilm, bj: int):
    """Build the prognostic supertensor (NYP, prog_k(nz), NXP)."""
    nz, ny, nx = u.shape
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    dead_h = jnp.zeros((nyp, K2 - 4, nxp), u.dtype)
    parts = [pack2(colp, bj), pack2(tsurf, bj), pack2(rain, bj),
             pack2(soilm, bj), dead_h,
             pack3(u, bj), pack3(v, bj, zero_ghost=True), pack3(pott, bj),
             pack3(qv, bj), pack3(qc, bj)]
    tail = prog_k(nz) - K2 - 5 * nz
    if tail:
        parts.append(jnp.zeros((nyp, tail, nxp), u.dtype))
    return jnp.concatenate(parts, axis=1)


def unpack_prog(prog, nz: int, ny: int, nx: int):
    """Inverse of pack_prog -> (u, v, pott, qv, qc, colp, tsurf, rain,
    soilm)."""
    f3 = lambda k0: unpack3(prog[:, k0:k0 + nz], nz, ny, nx)
    return (f3(K2), f3(K2 + nz), f3(K2 + 2 * nz), f3(K2 + 3 * nz),
            f3(K2 + 4 * nz), unpack2(prog[:, 0:1], ny, nx),
            unpack2(prog[:, 1:2], ny, nx), unpack2(prog[:, 2:3], ny, nx),
            unpack2(prog[:, 3:4], ny, nx))


def pack_radf(swflx_sfc, lwflx_sfc, dpottdt_rad, bj: int):
    """Build the radiation/flux supertensor (NYP, radf_k(nz), NXP)."""
    nz, ny, nx = dpottdt_rad.shape
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    parts = [pack2(swflx_sfc, bj), pack2(lwflx_sfc, bj),
             jnp.zeros((nyp, K2 - 2, nxp), dpottdt_rad.dtype),
             pack3(dpottdt_rad, bj)]
    tail = radf_k(nz) - K2 - nz
    if tail:
        parts.append(jnp.zeros((nyp, tail, nxp), dpottdt_rad.dtype))
    return jnp.concatenate(parts, axis=1)


def pack_aux2(hsurf, land_mask, albedo, evap_eff, bj: int):
    """Build the static 2-D supertensor (NYP, K2, NXP)."""
    ny, nx = hsurf.shape
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    return jnp.concatenate(
        [pack2(hsurf, bj), pack2(land_mask, bj), pack2(albedo, bj),
         pack2(evap_eff, bj), jnp.zeros((nyp, K2 - 4, nxp), hsurf.dtype)],
        axis=1)


def pack_geo(geo, bj: int):
    """(ny, K) -> (NYP, 1, K) with clamped ghost rows."""
    ny, k = geo.shape
    nyp = row_pad(ny, bj)
    g = geo[:, None, :]
    south = jnp.broadcast_to(g[:1], (HALO, 1, k))
    north = jnp.broadcast_to(g[-1:], (nyp - ny - HALO, 1, k))
    return jnp.concatenate([south, g, north], axis=0)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _s(x):
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _n(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _w(x):
    return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)


def _e(x):
    return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)


def _cumsum_k(x):
    """Inclusive prefix sum along axis 1 (the k sublanes) as a log-depth
    shift-and-add doubling scan (Mosaic has no cumsum primitive)."""
    n = x.shape[1]
    shift = 1
    while shift < n:
        pad = jnp.zeros_like(x[:, :shift])
        x = x + jnp.concatenate([pad, x[:, :-shift]], axis=1)
        shift *= 2
    return x


_MXU_SCAN = os.environ.get("CLIMATE_TPU_MXU_SCAN", "0") == "1"


def _cumsum_k2(x, n: int):
    """TWO independent inclusive prefix sums along axis 1 in one fused
    doubling scan: ``x`` is (rows, 2n, lanes) holding two n-long segments.
    The shifted operand is built as a segment-respecting 4-part concat, so
    each step is still one concat + one add — same adds per element as two
    separate ``_cumsum_k`` calls, half the op dispatches.

    CLIMATE_TPU_MXU_SCAN=1 swaps in an MXU formulation: one matmul against
    a 0/1 block-triangular matrix (exact in fp32 at precision=HIGHEST —
    products with 0/1 are exact; fp32 accumulation in a fixed order). The
    standalone probe measured it 0.87x the doubling scan, but inside the
    fused kernel the matmul can overlap independent VPU chains — measured
    via this flag (docs/STATUS.md round-3 probe log)."""
    if _MXU_SCAN:
        n2 = 2 * n
        r = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
        t = jnp.where((r >= cc) & ((r // n) == (cc // n)), 1.0, 0.0) \
            .astype(x.dtype)
        return jnp.matmul(t, x, precision=jax.lax.Precision.HIGHEST)
    shift = 1
    while shift < n:
        z = jnp.zeros_like(x[:, :shift])
        x = x + jnp.concatenate(
            [z, x[:, :n - shift], z, x[:, n:2 * n - shift]], axis=1)
        shift *= 2
    return x


def _kdn(x):
    """Shift +1 along k (x[k] <- x[k-1]; k=0 keeps itself — callers mask)."""
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _kup0(x):
    """Shift -1 along k with zero fill (x[k] <- x[k+1]; last k <- 0)."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


# Stream-buffer budget: Mosaic's compute temporaries cost ~1.6 MB per tile
# row at 1 deg on top of the stream buffers (measured from scoped-VMEM OOM
# reports), so leave them the lion's share of the vmem limit. 50 MB picks
# bj=30 at 1 deg (~105 MB total scoped demand vs the 110 MB limit — both
# measured to compile and run on v5e; the AOT scoped-vmem check fails fast
# if a new config overshoots, so lower these two knobs together if it does).
_VMEM_BUDGET_MB = int(os.environ.get("CLIMATE_TPU_VMEM_MB", "50"))
_VMEM_LIMIT_MB = int(os.environ.get("CLIMATE_TPU_VMEM_LIMIT_MB", "110"))


def pick_block_rows(nz: int, ny: int, nx: int, same_base: bool,
                    with_rad: bool, itemsize: int = 4,
                    vmem_budget: int = None, with_phys: bool = False) -> int:
    """Largest tile height whose stream-buffer footprint fits the budget
    (headroom left for Mosaic temporaries, which also grow with the tile;
    tune via CLIMATE_TPU_VMEM_MB / CLIMATE_TPU_VMEM_LIMIT_MB)."""
    if vmem_budget is None:
        vmem_budget = _VMEM_BUDGET_MB << 20
    nxp = lane_pad(nx)
    kp, kr = prog_k(nz), radf_k(nz)
    for bj in (36, 32, 30, 24, 20, 16, 12, 8, 6, 4, 3, 2):
        nt = -(-ny // bj)
        if nt < 2:
            continue
        w = bj + HALO + (HALO_N if with_phys else HALO)
        nu = bj + 2 if with_phys else bj
        rows = 2 * w * kp                                # eval supertensor
        if not same_base:
            rows += 2 * w * K2 + nu * (kp - K2)          # base head + body
        if with_rad or with_phys:
            rows += 2 * w * (kr if with_rad else K2)     # radf
        rows += 2 * w * K2                               # aux2
        rows += 2 * bj * kp                              # output
        gmax = max(HALO, nt * bj - ny + HALO_N)
        rows += gmax * kp                                # ghost-row buffer
        if rows * nxp * itemsize <= vmem_budget:
            return bj
    raise ValueError(f"no viable fused-kernel tile height for ny={ny}")


@functools.lru_cache(maxsize=32)
def make_fused_substep_packed(nz: int, ny: int, nx: int, *, bj: int,
                              same_base: bool, dy: float,
                              ptop: float, with_rad: bool,
                              with_diff: bool = False, dtype=jnp.float32,
                              interpret: bool = False, phys: tuple = None,
                              wrap_lon: bool = True,
                              wall_mask: bool = False,
                              debug_slots: bool = False):
    """Fused substep on PACKED supertensors. Returns

        ``f(prog_eval[, prog_base][, radf], aux2, geo, vert, dt) -> prog_out``

    with ``prog_base`` present iff not same_base, ``radf`` iff with_rad or
    phys; all shapes per the module docstring; geo is (NYP, 1, NGEO), vert
    is ``make_vert``'s (1, nz+1, NVERT) per-level operand.

    ``dt`` is a RUNTIME scalar (python float or () array): it rides into
    the kernel through an SMEM operand rather than being baked as a Mosaic
    constant, so one compiled program serves every timestep value — the
    adaptive-dt driver (reference solver.py per-step CFL dt) runs on this
    backend without recompiling, and sweeping dt is free.

    ``with_diff`` compiles in the horizontal-diffusion terms; the
    COEFFICIENT VALUES ride in per-latitude geo columns (kdiff_uv /
    kdiff_pott / kdiff_moist, [m2 s-1], from ``Grid``), so sweeping or
    retuning a coefficient never recompiles the kernel — only toggling the
    terms on/off does.

    ``phys`` enables the physics EPILOGUE (surface + turbulence +
    microphysics run on the updated fields inside this kernel — one HBM pass
    for the entire model step when chained with the packed scan). It is a
    hashable tuple ``(with_surface, with_turb, with_mic, drag_coef,
    soil_heat_capacity, ocean_heat_capacity, qc_autoconv_time,
    qc_autoconv_threshold, diff_coef_scalar, diff_coef_momentum)``. Without
    it, tsurf/rain pass through eval -> out unchanged.

    SHARDED MODE (dist/packed_halo.py): ``wrap_lon=False`` stops the kernel
    wrapping its output ghost columns periodically (a lon shard's east/west
    ghosts belong to its ring neighbors and are refreshed by ppermute
    between substeps; the locally-computed ghost values are kept — the
    innermost one is valid, which is what the physics epilogue's distance-1
    reads need). ``wall_mask=True`` takes the v polar-wall mask from AUX2
    slot 4 (per-shard data: the wall lives only on edge shards) instead of
    comparing local row indices against [0, ny)."""
    if nz < 2:
        raise ValueError("fused kernel requires nz >= 2")
    with_phys = phys is not None
    use_radf = with_rad or with_phys
    nt = -(-ny // bj)
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    kp, kr = prog_k(nz), radf_k(nz)
    w = bj + HALO + (HALO_N if with_phys else HALO)
    # rows of updated fields carried into the epilogue: one halo row each
    # side of the center block (tile rows [1, bj+3)) so the epilogue's
    # one-point neighbor reads stay valid on the center rows
    nu = bj + 2 if with_phys else bj
    u0 = HALO - 1 if with_phys else HALO      # tile-row offset of that slice
    ctr0 = 1 if with_phys else 0              # center offset within the slice

    # streams: (name, arg_idx, k0, nk, row_window, slots); the corrector's
    # base supertensor splits into a 2-D head (full stencil window — COLP_old
    # feeds the continuity stencil) and a 3-D body (update rows only — the
    # big base fields are consumed only at the proceed stage)
    streams = [("eval", 0, 0, kp, "w", 2)]
    ai = 1
    if not same_base:
        # 2-D head double-buffered (prefetched a tile ahead: it is consumed
        # at the top of the tile); the big 3-D body stays single-buffered
        # with a deferred wait (consumed only at the proceed stage, so its
        # same-tile DMA hides under the tendency compute at half the VMEM)
        streams += [("base2d", ai, 0, K2, "w", 2),
                    ("base3d", ai, K2, kp - K2, "nu", 1)]
        ai += 1
    if use_radf:
        streams += [("radf", ai, 0, kr if with_rad else K2, "w", 2)]
        ai += 1
    streams += [("aux2", ai, 0, K2, "w", 2)]
    n_args = ai + 1
    n_streams = len(streams)
    late_wait = frozenset({"base3d"})

    # output supertensor fields: (name, k0, nk, zero_ghost)
    out_fields = [("colp", 0, 1, False), ("tsurf", 1, 1, False),
                  ("rain", 2, 1, False), ("soilm", 3, 1, False),
                  ("u", K2, nz, False),
                  ("v", K2 + nz, nz, True), ("pott", K2 + 2 * nz, nz, False),
                  ("qv", K2 + 3 * nz, nz, False),
                  ("qc", K2 + 4 * nz, nz, False)]
    gn = nyp - HALO - ny                      # north ghost+pad rows to fill
    gmax = max(HALO, gn)

    def kernel(*refs):
        hbm = refs[:n_args]
        geo_ref = refs[n_args]
        vert_ref = refs[n_args + 1]
        dt_ref = refs[n_args + 2]          # SMEM (2,): [dt, qc autoconv frac]
        out_ref = refs[n_args + 3]
        scr = refs[n_args + 4:]
        bufs = scr[:n_streams]
        sem_in = scr[n_streams]
        obuf = scr[n_streams + 1]
        sem_out = scr[n_streams + 2]
        gbuf = scr[n_streams + 3]
        sem_g = scr[n_streams + 4]

        i = pl.program_id(0)
        dt = dt_ref[0]                     # runtime timestep (scalar reg)

        def in_descr(s, tile, slot):
            name, a, k0, nk, rw, slots = streams[s]
            sl = slot % slots
            if rw == "nu":
                row0, nrows = tile * bj + u0, nu
            else:
                row0, nrows = tile * bj, w
            if k0 == 0 and nk == hbm[a].shape[1]:
                src = hbm[a].at[pl.ds(row0, nrows)]
            else:
                src = hbm[a].at[pl.ds(row0, nrows), pl.ds(k0, nk)]
            return pltpu.make_async_copy(src, bufs[s].at[sl],
                                         sem_in.at[sl, s])

        @pl.when(i == 0)
        def _():
            for s, st in enumerate(streams):
                if st[5] == 2:
                    in_descr(s, 0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            for s, st in enumerate(streams):
                if st[5] == 2:
                    in_descr(s, i + 1, i + 1).start()

        for s, st in enumerate(streams):
            if st[5] == 1:
                in_descr(s, i, 0).start()
        for s, st in enumerate(streams):
            # the single-buffered 3-D base body is only consumed at the
            # proceed stage; defer its wait so the DMA overlaps the tendency
            # compute of this tile
            if st[0] in late_wait:
                continue
            in_descr(s, i, i if st[5] == 2 else 0).wait()

        def wait_late():
            for s, st in enumerate(streams):
                if st[0] in late_wait:
                    in_descr(s, i, 0).wait()

        slot = i % 2
        # NOTE: indexing a VMEM buffer LOADS it at this trace point, so the
        # late-waited base3d stream must NOT be read here — loading before
        # wait_late() races its in-flight DMA on real hardware (observed:
        # stale VMEM from the previous kernel read as u/v base values;
        # interpret mode's synchronous copies hide the hazard entirely).
        sbuf = {st[0]: bufs[s][slot % st[5]] for s, st in enumerate(streams)
                if st[0] not in late_wait}

        E = sbuf["eval"]                                    # (w, kp, nxp)
        ce = E[:, 0:1]
        u, v = E[:, K2:K2 + nz], E[:, K2 + nz:K2 + 2 * nz]
        pt = E[:, K2 + 2 * nz:K2 + 3 * nz]
        qv = E[:, K2 + 3 * nz:K2 + 4 * nz]
        qc = E[:, K2 + 4 * nz:K2 + 5 * nz]
        if same_base:
            cb = ce
            ub, vb = u, v
        else:
            cb = sbuf["base2d"][:, 0:1]                     # (w, 1, nxp)
            # base3d (ub/vb/base scalars; k-window [K2, kp) at the nu update
            # rows) is loaded ONLY after wait_late() below — see the sbuf
            # comment (DMA race otherwise)
            b3_idx = next(s for s, st in enumerate(streams)
                          if st[0] == "base3d")
        A2 = sbuf["aux2"]
        hs = A2[:, 0:1]
        rad = sbuf["radf"][:, K2:K2 + nz] if with_rad else None

        geo = geo_ref[pl.ds(i * bj, w)]                     # (w, 1, NGEO)

        def gcol(name):
            idx = GEO_FIELDS.index(name)
            return geo[:, :, idx:idx + 1]                   # (w, 1, 1)

        area, area_v, dx, dxs = (gcol("area"), gcol("area_v"), gcol("dx"),
                                 gcol("dxs"))
        corf, corf_v = gcol("corf"), gcol("corf_v")
        tanl, tanl_v = gcol("tan_lat"), gcol("tan_lat_v")

        # ---- diagnostics (NUMERICS.md), vectorized over the k sublanes ----
        # (per-k python loops would emit (w, 1, nxp) thin ops at 1/8 sublane
        # utilization; everything here runs on (w, nz(+1), nxp) tiles, with
        # the two true vertical scans expressed as sublane-axis cumsums)
        # per-level sigma geometry from the VERT operand (general borders/
        # thicknesses incl. stretched grids; see make_vert)
        vert = vert_ref[:]                                   # (1, nz+1, 2)
        sig_b = vert[:, :, 0:1]                              # (1, nz+1, 1)
        dsig_c = vert[:, :nz, 1:2]                           # (1, nz, 1)
        dsig3 = jnp.concatenate([dsig_c, dsig_c, dsig_c], axis=1)
        dsig_sfc = vert[:, nz - 1:nz, 1:2]                   # (1, 1, 1)
        pvb3 = ptop + sig_b * ce                             # (w, nz+1, nxp)
        pvtfvb3 = (pvb3 / c.P_REF) ** c.KAPPA
        # hoisted hi/lo level slices and C_P*pott (multi-consumer values:
        # hand-CSE'd because every materialized intermediate is one VMEM
        # round-trip, the kernel's unit of cost — see docs/STATUS.md probe)
        pvb_hi, pvb_lo = pvb3[:, 1:], pvb3[:, :-1]
        pvtfvb_hi, pvtfvb_lo = pvtfvb3[:, 1:], pvtfvb3[:, :-1]
        pvtf3 = (pvb_hi * pvtfvb_hi - pvb_lo * pvtfvb_lo) \
            / ((1.0 + c.KAPPA) * (pvb_hi - pvb_lo))
        cppt = c.C_P * pt
        # hydrostatic suffix sum: phivb[k+1] = g*hs + sum_{k'>k} jump[k']
        jump3 = cppt * (pvtfvb_hi - pvtfvb_lo)

        # ---- continuity (flux divergence first: its prefix k-scan fuses
        # with the hydrostatic scan into ONE two-segment doubling scan) ----
        colp_u = 0.5 * (_w(ce) + ce)
        colp_v = 0.5 * (_s(ce) + ce)
        uflx = u * colp_u * dy
        vflx = v * colp_v * dxs
        e_uflx = _e(uflx)
        n_vflx = _n(vflx)
        div = (e_uflx - uflx + n_vflx - vflx) / area

        both = _cumsum_k2(jnp.concatenate([jump3, div * dsig_c], axis=1), nz)
        incl = both[:, :nz]                                  # sum_{k'<=k}
        csum = both[:, nz:2 * nz]
        total_j = incl[:, nz - 1:nz]                         # full-column sum
        suffix_excl = total_j - incl                         # sum_{k'>k}
        phi3 = c.G * hs + suffix_excl + cppt * (pvtfvb_hi - pvtf3)

        # WWIND interior borders 1..nz-1 via the prefix cumsum over k; the
        # column total (= -dCOLP/dt) is the cumsum's last element.
        # w3h is HALF the sigma-velocity (the 0.5 of every midpoint average
        # it multiplies is folded in once here).
        dcolpdt = -csum[:, nz - 1:nz]                        # (w, 1, nxp)
        cn = cb + dt * dcolpdt
        w3h = (csum[:, :-1] + sig_b[:, 1:nz] * dcolpdt) \
            / (-2.0 * cn)                                    # (w, nz-1, nxp)

        # `upd` slices carry the updated fields: the center block plus (when
        # the physics epilogue is on) one extra halo row each side so the
        # epilogue's neighbor reads stay valid on the center rows.
        upd = lambda x: x[u0:u0 + nu]
        ctr_of_upd = lambda x: x[ctr0:ctr0 + bj]
        # base 3-D fields arrive pre-windowed to the nu update rows
        upd_b = upd if same_base else (lambda x: x)
        cn_c, cb_c = upd(cn), upd(cb)
        oslot = i % 2

        def out_descr(tile, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], out_ref.at[pl.ds(HALO + tile * bj, bj)],
                sem_out.at[slot])

        @pl.when(i >= 2)
        def _():
            out_descr(i - 2, oslot).wait()

        def fix_ghost_cols(new):
            """Maintain the periodic wrap columns of an output tile (sharded
            lon: keep the locally-computed ghost columns; ppermute refreshes
            them between substeps)."""
            if not wrap_lon:
                return new
            west = new[..., GX + nx - GX:GX + nx]           # logical nx-2..nx-1
            east = new[..., GX:2 * GX]                      # logical 0..1
            return jnp.concatenate(
                [west, new[..., GX:GX + nx], east,
                 new[..., 2 * GX + nx:]], axis=-1)

        outs_new = {}

        def store(name, new_center):
            k0, nk = next((f[1], f[2]) for f in out_fields if f[0] == name)
            outs_new[name] = fix_ghost_cols(new_center)
            obuf[oslot, :, k0:k0 + nk] = outs_new[name]

        # ---- scalar tendencies + proceed: pott/qv/qc BATCHED as one
        # (w, 3nz, nxp) advection pass. The three fields are contiguous
        # sublane ranges of the supertensor, so the batch is a single slice;
        # the flux factors are tiled 3x once, and every subsequent op runs
        # at 3x sublane height = 1/3 the op dispatches of three thin passes
        # (the per-element math and order are unchanged). ----
        zero_b = jnp.zeros_like(cn)
        Q = E[:, K2 + 2 * nz:K2 + 5 * nz]                   # pott|qv|qc
        uflxh, vflxh = 0.5 * uflx, 0.5 * vflx
        uflx3h = jnp.concatenate([uflxh, uflxh, uflxh], axis=1)
        vflx3h = jnp.concatenate([vflxh, vflxh, vflxh], axis=1)
        # vertical flux factor at cell-bottom borders: wpad[0] = 0 encodes
        # the zero top-border flux AND masks the segment-crossing garbage
        # row that _kdn drags across field boundaries in the batch
        wpad = jnp.concatenate([zero_b, w3h], axis=1)       # (w, nz, nxp)
        wpad3 = jnp.concatenate([wpad, wpad, wpad], axis=1)

        fx = uflx3h * (_w(Q) + Q)
        fy = vflx3h * (_s(Q) + Q)
        dqdt = -(_e(fx) - fx + _n(fy) - fy) / area
        bflx = wpad3 * cn * (_kdn(Q) + Q)                   # border k flux
        # _kup0 crossing a segment boundary reads the next field's zero
        # top-border flux — exactly the zero bottom-border flux needed
        dqdt = dqdt - (_kup0(bflx) - bflx) / dsig3
        if with_rad:
            dqdt = jnp.concatenate(
                [dqdt[:, :nz] + ce * rad, dqdt[:, nz:]], axis=1)
        if with_diff:
            lap = (_e(Q) - 2.0 * Q + _w(Q)) / (dx * dx) \
                + (_n(Q) - 2.0 * Q + _s(Q)) / (dy * dy)
            kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * nz, 1), 1)
            dcoef = jnp.where(kidx < nz, gcol("kdiff_pott"),
                              gcol("kdiff_moist"))        # (w, 3nz, 1)
            dqdt = dqdt + dcoef * ce * lap

        if not same_base:
            wait_late()
            # the base3d DMA has landed: safe to load the buffer now
            B = bufs[b3_idx][0]
            ub, vb = B[:, 0:nz], B[:, nz:2 * nz]
        QB = Q if same_base else B[:, 2 * nz:5 * nz]
        Qn = (upd_b(QB) * cb_c + dt * upd(dqdt)) / cn_c
        pt2 = Qn[:, :nz]
        qvqc_r = Qn[:, nz:]
        qvqc = jnp.where(qvqc_r > 0.0, qvqc_r, 0.0)
        qv2, qc2 = qvqc[:, :nz], qvqc[:, nz:]

        # ---- momentum (shared shifted operands hoisted) ----
        ue_ = _e(u)
        su_ = _s(u)
        vn_ = _n(v)
        wv_ = _w(v)

        # ---- momentum: u ----
        fxc = 0.5 * (uflx + e_uflx) * 0.5 * (u + ue_)
        fyc = 0.5 * (_w(vflx) + vflx) * 0.5 * (su_ + u)
        adv_u = -(fxc - _w(fxc) + _n(fyc) - fyc) / area

        w_u3 = _w(w3h) + w3h                                # (w, nz-1, nxp)
        cn_u = 0.5 * (_w(cn) + cn)
        fz_u = w_u3 * cn_u * 0.5 * (u[:, :-1] + u[:, 1:])   # (w, nz-1, nxp)
        zero3 = jnp.zeros_like(cn)
        fz_u_full = jnp.concatenate([zero3, fz_u, zero3], axis=1)
        vadv_u = -(fz_u_full[:, 1:] - fz_u_full[:, :-1]) / dsig_c

        v_at_u = 0.25 * (wv_ + v + _w(vn_) + vn_)
        cor_u = colp_u * (corf + u * tanl / c.R_EARTH) * v_at_u

        cp_pott_u = 0.5 * (_w(cppt) + cppt)                 # C_P * pott_u
        pgf_u = -colp_u * ((phi3 - _w(phi3))
                           + cp_pott_u * (pvtf3 - _w(pvtf3))) / dx

        dudt = adv_u + vadv_u + cor_u + pgf_u
        if with_diff:
            lap = (_e(u) - 2.0 * u + _w(u)) / (dx * dx) \
                + (_n(u) - 2.0 * u + su_) / (dy * dy)
            dudt = dudt + gcol("kdiff_uv") * colp_u * lap

        cu_old = 0.5 * (_w(cb) + cb)
        u2 = (upd_b(ub) * upd(cu_old) + dt * upd(dudt)) / upd(cn_u)

        # ---- momentum: v ----
        fyc_v = 0.5 * (vflx + n_vflx) * 0.5 * (v + vn_)
        fxc_v = 0.5 * (_s(uflx) + uflx) * 0.5 * (wv_ + v)
        adv_v = -(_e(fxc_v) - fxc_v + fyc_v - _s(fyc_v)) / area_v

        w_v3 = _s(w3h) + w3h
        cn_v = 0.5 * (_s(cn) + cn)
        fz_v = w_v3 * cn_v * 0.5 * (v[:, :-1] + v[:, 1:])
        fz_v_full = jnp.concatenate([zero3, fz_v, zero3], axis=1)
        vadv_v = -(fz_v_full[:, 1:] - fz_v_full[:, :-1]) / dsig_c

        u_at_v = 0.25 * (su_ + _s(ue_) + u + ue_)
        cor_v = -colp_v * (corf_v + u_at_v * tanl_v / c.R_EARTH) * u_at_v

        cp_pott_v = 0.5 * (_s(cppt) + cppt)                 # C_P * pott_v
        pgf_v = -colp_v * ((phi3 - _s(phi3))
                           + cp_pott_v * (pvtf3 - _s(pvtf3))) / dy

        dvdt = adv_v + vadv_v + cor_v + pgf_v
        if with_diff:
            lap = (_e(v) - 2.0 * v + wv_) / (dx * dx) \
                + (vn_ - 2.0 * v + _s(v)) / (dy * dy)
            dvdt = dvdt + gcol("kdiff_uv") * colp_v * lap

        cv_old = 0.5 * (_s(cb) + cb)
        v2 = (upd_b(vb) * upd(cv_old) + dt * upd(dvdt)) / upd(cn_v)
        # v walls: global row 0 stays zero, and any slice rows beyond the
        # domain (the north wall face and ghost rows, read by the physics
        # epilogue's surface-wind average) are zero too. Global row of upd
        # slice index r is i*bj + r - ctr0. In sharded mode the wall mask is
        # per-shard data (AUX2 slot 4: 1 on interior v rows, 0 on walls).
        if wall_mask:
            vmask = upd(A2[:, 4:5])                         # (nu, 1, nxp)
            apply_wall = lambda vv: vv * vmask
        else:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (nu, 1, 1), 0) \
                + i * bj - ctr0
            v_wall = jnp.logical_or(row_ids <= 0, row_ids >= ny)
            apply_wall = lambda vv: jnp.where(v_wall, jnp.zeros_like(vv), vv)
        v2 = apply_wall(v2)

        if debug_slots and not with_phys:
            # diagnostics channel: write chosen intermediates into the dead
            # head slots 4..7 so a host-side probe can compare them against
            # jnp recomputations (hardware debugging; no effect on results)
            obuf[oslot, :, 4:5] = upd(u[:, nz - 1:nz])       # raw input DMA
            obuf[oslot, :, 5:6] = upd(pvtf3[:, nz - 1:nz])   # sig_b+pow chain
            obuf[oslot, :, 6:7] = upd(phi3[:, 0:1])          # scan chain
            obuf[oslot, :, 7:8] = jnp.broadcast_to(
                sig_b[:, nz:nz + 1], (nu, 1, nxp)).astype(dtype)  # iota
        if not with_phys:
            store("u", u2)
            store("v", v2)
            store("pott", pt2)
            store("qv", qv2)
            store("qc", qc2)
            store("colp", cn_c)
            # tsurf/rain/soilm pass through unchanged (they are advanced by
            # the epilogue variant; the jnp physics splits handle them here)
            store("tsurf", upd(E[:, 1:2]))
            store("rain", upd(E[:, 2:3]))
            store("soilm", upd(E[:, 3:4]))
        else:
            # ---------------- physics epilogue ----------------
            # surface + turbulence + microphysics on the updated fields
            # (same math as the jnp physics modules, which mirror the
            # reference physics; all slices are (nu, K, nxp) with center rows
            # [ctr0, ctr0+bj)). u2/v2 need valid wrap columns first (their
            # ghost-column values were computed from clamp garbage).
            (w_srf, w_trb, w_mic, drag_coef, soil_cap, ocean_cap,
             qc_tau, qc_thr, k_scalar, k_mom, w_soil, sm_cap,
             w_conv, conv_k, conv_rh) = phys
            u2 = fix_ghost_cols(u2)
            v2 = fix_ghost_cols(v2)
            # pt2 feeds laterally-shifted dz/rho in the turbulence epilogue
            pt2 = fix_ghost_cols(pt2)
            cn_u2 = cn_c                      # (nu, 1, nxp), wrap cols valid
            RF = sbuf["radf"]
            tsurf2 = upd(E[:, 1:2])[:, 0]
            rain2 = upd(E[:, 2:3])[:, 0]
            sm2 = upd(E[:, 3:4])[:, 0]
            sw2 = upd(RF[:, 0:1])[:, 0]
            lw2 = upd(RF[:, 1:2])[:, 0]
            land2 = upd(A2[:, 1:2])[:, 0]
            evap2 = upd(A2[:, 3:4])[:, 0]

            # pressure/Exner of the NEW colp (physics sees post-dynamics colp)
            pvb_n = ptop + sig_b * cn_u2                   # (nu, nz+1, nxp)
            pvtfvb_n = (pvb_n / c.P_REF) ** c.KAPPA
            pvbn_hi, pvbn_lo = pvb_n[:, 1:], pvb_n[:, :-1]
            pvtfvbn_hi, pvtfvbn_lo = pvtfvb_n[:, 1:], pvtfvb_n[:, :-1]
            pvtf_n = (pvbn_hi * pvtfvbn_hi - pvbn_lo * pvtfvbn_lo) \
                / ((1.0 + c.KAPPA) * (pvbn_hi - pvbn_lo))

            def relu(x):
                # value-identical to jnp.maximum(x, 0.0) for non-NaN inputs;
                # where lowers to a fusable select (measured: maximum breaks
                # Mosaic's elementwise fusion, probe_ops history in STATUS.md)
                return jnp.where(x > 0.0, x, 0.0)

            def row_shift_s(x):
                return jnp.concatenate([x[:1], x[:-1]], axis=0)

            def row_shift_n(x):
                return jnp.concatenate([x[1:], x[-1:]], axis=0)

            if w_srf:
                # ---- surface (2-D math on squeezed (nu, nxp) arrays) ----
                # NOTE: positive int indices only — jnp lowers negative int
                # indexing to dynamic_slice, which Mosaic cannot lower.
                pvtf_b = pvtf_n[:, nz - 1]
                t_air = pt2[:, nz - 1] * pvtf_b
                p_air = 0.5 * (pvb_n[:, nz - 1] + pvb_n[:, nz])
                rho = p_air / (c.R_D * t_air)
                u_b, v_b = u2[:, nz - 1], v2[:, nz - 1]
                u_cc = 0.5 * (u_b + _e(u_b))
                v_cc = 0.5 * (v_b + row_shift_n(v_b))
                wind = jnp.sqrt(u_cc * u_cc + v_cc * v_cc + 1.0)
                shflx = rho * c.C_P * drag_coef * wind * (tsurf2 - t_air)
                t_c = tsurf2 - c.T_ZERO_C
                esat = c.MAGNUS_E0 * jnp.exp(
                    c.MAGNUS_A * t_c / (t_c + c.MAGNUS_B))
                den_s = pvb_n[:, nz] - (1.0 - c.EPS_V) * esat
                qsat_s = c.EPS_V * esat / jnp.where(den_s > 1.0, den_s, 1.0)
                if w_soil:
                    # soil-hydrology evap efficiency (surface.py
                    # evap_efficiency): land follows the bucket fraction,
                    # ocean evaporates freely
                    frac = relu(sm2) / sm_cap
                    frac = jnp.where(frac < 1.0, frac, 1.0)
                    eff = jnp.where(land2 > 0.5, frac,
                                    jnp.ones_like(frac))
                else:
                    eff = evap2
                evap_f = rho * drag_coef * wind * eff \
                    * relu(qsat_s - qv2[:, nz - 1])
                lhflx = c.L_V * evap_f
                taux = -rho * drag_coef * wind * u_cc
                tauy = -rho * drag_coef * wind * v_cc
                heat_cap = jnp.where(land2 > 0.5, soil_cap, ocean_cap)
                net = sw2 + lw2 - shflx - lhflx
                tsurf2 = tsurf2 + dt * net / heat_cap
                if w_soil:
                    # evaporation dries the land bucket (surface.py)
                    dr = sm2 - dt * evap_f / c.RHO_WATER
                    dr = jnp.where(dr < sm_cap, relu(dr), sm_cap)
                    sm2 = jnp.where(land2 > 0.5, dr, sm2)
                # 3-D multiply then squeeze: a squeezed (1,1) operand would
                # need a sublane+lane broadcast Mosaic cannot lower
                dp_sfc = (cn_u2 * dsig_sfc)[:, 0]
                m_sfc = dp_sfc / c.G

                def add_bottom(x, delta):
                    # Mosaic has no dynamic-update-slice on values; update
                    # the bottom level via a static concatenate instead.
                    return jnp.concatenate(
                        [x[:, :-1], x[:, -1:] + delta[:, None]], axis=1)

                pt2 = add_bottom(pt2, dt * shflx / (c.C_P * m_sfc) / pvtf_b)
                qv2 = add_bottom(qv2, dt * evap_f / m_sfc)
                m_u = 0.5 * (_w(dp_sfc) + dp_sfc) / c.G
                m_v = 0.5 * (row_shift_s(dp_sfc) + dp_sfc) / c.G
                u2 = add_bottom(u2, dt * 0.5 * (_w(taux) + taux) / m_u)
                v2 = add_bottom(v2, dt * 0.5 * (row_shift_s(tauy) + tauy) / m_v)
                v2 = apply_wall(v2)

            if w_trb:
                # ---- turbulence: vertical K-diffusion ----
                cppt2 = c.C_P * pt2
                jump_n = cppt2 * (pvtfvbn_hi - pvtfvbn_lo)
                incl_n = _cumsum_k(jump_n)
                sfx = incl_n[:, nz - 1:nz] - incl_n
                phivb_sfc = c.G * upd(hs)
                phi_n = phivb_sfc + sfx + cppt2 * (pvtfvbn_hi - pvtf_n)
                phivb_rest = phivb_sfc + sfx + jump_n
                phivb_n = jnp.concatenate([phivb_rest, phivb_sfc], axis=1)
                tair_n = pt2 * pvtf_n
                z_cn = phi_n / c.G
                z_vbn = phivb_n / c.G
                dz_cn = z_vbn[:, :-1] - z_vbn[:, 1:]
                dz_vbn = z_cn[:, :-1] - z_cn[:, 1:]
                pair_vb = pvb_n[:, 1:-1]
                tair_vb = 0.5 * (tair_n[:, :-1] + tair_n[:, 1:])
                rho_vb = pair_vb / (c.R_D * tair_vb)
                rho_cn = (pvbn_hi - pvbn_lo) / (c.G * dz_cn)

                def diffuse(x, kco, dzc, dzvb, rvb, rc):
                    grad = (x[:, :-1] - x[:, 1:]) / dzvb
                    flux = -kco * rvb * grad
                    zz = jnp.zeros_like(flux[:, :1])
                    flux = jnp.concatenate([zz, flux, zz], axis=1)
                    return x + dt * (flux[:, 1:] - flux[:, :-1]) / (rc * dzc)

                # scalar K; + per-interface moist-convective enhancement
                # (physics/turbulence.py::convective_k, same traced math —
                # near-saturated interfaces with saturation-theta_e
                # decreasing upward mix at conv_k instead of k_scalar)
                ks_eff = k_scalar
                if w_conv:
                    pair_t = 0.5 * (pvbn_lo + pvbn_hi)
                    tc_t = tair_n - c.T_ZERO_C
                    esat_t = c.MAGNUS_E0 * jnp.exp(
                        c.MAGNUS_A * tc_t / (tc_t + c.MAGNUS_B))
                    den_t = pair_t - (1.0 - c.EPS_V) * esat_t
                    qs_t = c.EPS_V * esat_t / jnp.where(den_t > 1.0, den_t,
                                                        1.0)
                    rh_t = qv2 / jnp.where(qs_t > 1e-10, qs_t, 1e-10)
                    th_es = pt2 * jnp.exp(c.L_V * qs_t / (c.C_P * tair_n))
                    rh_up, rh_lo = rh_t[:, :-1], rh_t[:, 1:]
                    rh_min = jnp.where(rh_up < rh_lo, rh_up, rh_lo)
                    fire = (rh_min > conv_rh) & (th_es[:, :-1] < th_es[:, 1:])
                    ks_eff = k_scalar + jnp.where(fire, conv_k, 0.0)

                pt2 = diffuse(pt2, ks_eff, dz_cn, dz_vbn, rho_vb, rho_cn)
                qv2 = relu(
                    diffuse(qv2, ks_eff, dz_cn, dz_vbn, rho_vb, rho_cn))
                qc2 = relu(
                    diffuse(qc2, ks_eff, dz_cn, dz_vbn, rho_vb, rho_cn))
                dz_c_u = 0.5 * (_w(dz_cn) + dz_cn)
                dz_vb_u = 0.5 * (_w(dz_vbn) + dz_vbn)
                rvb_u = 0.5 * (_w(rho_vb) + rho_vb)
                rc_u = 0.5 * (_w(rho_cn) + rho_cn)
                u2 = diffuse(u2, k_mom, dz_c_u, dz_vb_u, rvb_u, rc_u)
                dz_c_v = 0.5 * (row_shift_s(dz_cn) + dz_cn)
                dz_vb_v = 0.5 * (row_shift_s(dz_vbn) + dz_vbn)
                rvb_v = 0.5 * (row_shift_s(rho_vb) + rho_vb)
                rc_v = 0.5 * (row_shift_s(rho_cn) + rho_cn)
                v2 = diffuse(v2, k_mom, dz_c_v, dz_vb_v, rvb_v, rc_v)
                v2 = apply_wall(v2)

            if w_mic:
                # ---- microphysics: saturation adjustment + autoconversion ----
                pair = 0.5 * (pvbn_lo + pvbn_hi)
                tair_m = pt2 * pvtf_n
                t_c = tair_m - c.T_ZERO_C
                esat = c.MAGNUS_E0 * jnp.exp(
                    c.MAGNUS_A * t_c / (t_c + c.MAGNUS_B))
                den_m = pair - (1.0 - c.EPS_V) * esat
                qsat = c.EPS_V * esat / jnp.where(den_m > 1.0, den_m, 1.0)
                gamma = 1.0 + (c.L_V ** 2) * qsat \
                    / (c.C_P * c.R_V * tair_m * tair_m)
                dq = (qv2 - qsat) / gamma
                cond = relu(dq)
                ndq = relu(-dq)
                evp = jnp.where(qc2 < ndq, qc2, ndq)
                dqc = cond - evp
                qv2 = relu(qv2 - dqc)
                qc2 = qc2 + dqc
                pt2 = pt2 + (c.L_V / c.C_P) * dqc / pvtf_n
                # 1 - exp(-dt/tau), precomputed outside (traced with the
                # same jnp ops as microphysics_step) and carried in the
                # SMEM operand: dt is a runtime scalar here
                frac = dt_ref[1]
                to_rain = relu(qc2 - qc_thr) * frac
                qc2 = relu(qc2 - to_rain)
                # per-level layer mass (matches jnp microphysics_step's
                # sum(to_rain * colp * dsigma) ordering)
                rain_inc = jnp.sum(to_rain * (cn_u2 * dsig_c), axis=1) / c.G
                rain2 = rain2 + rain_inc
                if w_soil:
                    # rain refills the land bucket up to field capacity
                    # (microphysics.py soil-hydrology coupling)
                    wet = sm2 + rain_inc / c.RHO_WATER
                    wet = jnp.where(wet < sm_cap, wet, sm_cap)
                    sm2 = jnp.where(land2 > 0.5, wet, sm2)

            store("u", ctr_of_upd(u2))
            store("v", ctr_of_upd(v2))
            store("pott", ctr_of_upd(pt2))
            store("qv", ctr_of_upd(qv2))
            store("qc", ctr_of_upd(qc2))
            store("colp", ctr_of_upd(cn_c))
            store("tsurf", ctr_of_upd(tsurf2[:, None]))
            store("rain", ctr_of_upd(rain2[:, None]))
            store("soilm", ctr_of_upd(sm2[:, None]))

        # ---- output DMA ----
        out_descr(i, oslot).start()

        # ---- wall-ghost rows (edge tiles only; sequenced after main DMA) ----
        def fill_ghost(row_sel):
            for name, k0, nk, zg in out_fields:
                src = (jnp.zeros_like(outs_new[name][:1]) if zg
                       else outs_new[name][row_sel:row_sel + 1])
                gbuf[:, k0:k0 + nk] = jnp.broadcast_to(
                    src, (gmax,) + src.shape[1:])

        def ghost_descr(row0, nrows):
            return pltpu.make_async_copy(
                gbuf.at[pl.ds(0, nrows)],
                out_ref.at[pl.ds(row0, nrows)], sem_g)

        @pl.when(i == 0)
        def _():
            fill_ghost(0)
            d = ghost_descr(0, HALO)
            d.start()
            d.wait()

        @pl.when(i == nt - 1)
        def _():
            # drain outstanding main DMAs first: the north ghost rows
            # overlap the last tile's pad rows when bj does not divide ny
            @pl.when(i >= 1)
            def _():
                out_descr(i - 1, (i - 1) % 2).wait()
            out_descr(i, oslot).wait()
            fill_ghost(ny - 1 - (nt - 1) * bj)  # row of last real lat
            d = ghost_descr(HALO + ny, gn)
            d.start()
            d.wait()

    # ---------------- pallas_call assembly ----------------
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_args)]
    in_specs.append(pl.BlockSpec((nyp, 1, NGEO), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))       # geo
    in_specs.append(pl.BlockSpec((1, nz + 1, NVERT), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))       # vert
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))       # dt scalars
    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    out_shape = jax.ShapeDtypeStruct((nyp, kp, nxp), dtype)

    scratch = []
    for name, a, k0, nk, rw, slots in streams:
        rows = nu if rw == "nu" else w
        scratch.append(pltpu.VMEM((slots, rows, nk, nxp), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, n_streams)))
    scratch.append(pltpu.VMEM((2, bj, kp, nxp), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch.append(pltpu.VMEM((gmax, kp, nxp), dtype))
    scratch.append(pltpu.SemaphoreType.DMA(()))

    call = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_MB << 20,
        ),
    )

    qc_tau = phys[6] if with_phys else None

    def substep_packed(*packed_args):
        *packed, dt_in = packed_args
        dt_s = jnp.asarray(dt_in, dtype).reshape(())
        if with_phys and phys[2]:          # microphysics epilogue on
            frac = 1.0 - jnp.exp(-dt_s / qc_tau)
        else:
            frac = jnp.zeros((), dtype)
        return call(*packed, jnp.stack([dt_s, frac]))

    return substep_packed


def make_fused_substep(nz: int, ny: int, nx: int, *, bj: int,
                       same_base: bool, dt: float, dy: float, ptop: float,
                       with_rad: bool, with_diff: bool = False,
                       dtype=jnp.float32, interpret: bool = False,
                       debug_slots: bool = False,
                       sigma_vb=None, dsigma=None):
    """Standard-layout wrapper (packs inputs, unpacks outputs): same
    signature as the packed kernel but on (nz, ny, nx)/(ny, nx) arrays —
    used by unit tests; the stepper chains packed substeps directly.
    ``sigma_vb``/``dsigma`` default to uniform spacing; pass the grid's
    arrays for stretched-sigma runs. ``debug_slots`` also returns the 4
    diagnostics slots (hardware debugging channel; see the kernel body)."""
    kern = make_fused_substep_packed(
        nz, ny, nx, bj=bj, same_base=same_base, dy=dy, ptop=ptop,
        with_rad=with_rad, with_diff=with_diff, dtype=dtype,
        interpret=interpret, debug_slots=debug_slots)
    if sigma_vb is None:
        sigma_vb = np.linspace(0.0, 1.0, nz + 1)
        dsigma = np.diff(sigma_vb)
    vert = make_vert(sigma_vb, dsigma, dtype)

    def substep(u, v, pott, qv, qc, colp, hs, geo, *extra):
        z2 = jnp.zeros_like(colp)
        args = [pack_prog(u, v, pott, qv, qc, colp, z2, z2, z2, bj)]
        idx = 0
        if not same_base:
            args.append(pack_prog(*extra[idx:idx + 6], z2, z2, z2, bj))
            idx += 6
        if with_rad:
            args.append(pack_radf(z2, z2, extra[idx], bj))
            idx += 1
        args.append(pack_aux2(hs, z2, z2, z2, bj))
        args.append(pack_geo(geo, bj))
        args.append(vert)
        args.append(dt)
        out = kern(*args)
        u, v, pott, qv, qc, colp = unpack_prog(out, nz, ny, nx)[:6]
        if debug_slots:
            dbg = tuple(unpack2(out[:, k:k + 1], ny, nx) for k in (4, 5, 6, 7))
            return (u, v, pott, qv, qc, colp) + dbg
        return u, v, pott, qv, qc, colp

    return substep
