"""Per-kernel micro-benchmark: scan-chained fused-kernel timing.

Measures each fused Pallas kernel (predictor, corrector+physics-epilogue)
and the packed radiation step in isolation, the way that is actually valid
over the tunneled-TPU setup: CHAINED in a ``lax.scan`` with the output fed
back as the next input. One-off dispatch timing is garbage here — identical
-input dispatches get deduped by the runtime and the ~30 ms host->device
RTT swamps sub-ms kernels (CLAUDE.md perf log).

Each kernel is compared against its analytic DMA byte floor (bytes the
kernel streams per launch / HBM bandwidth) so the report shows whether it
is DMA- or compute-bound; the VPU op-equivalent column converts measured
time into full-tile vector-op units (elements / 1024 lanes / 940 MHz) —
the op-count currency the perf log's roofline analysis uses.

Usage: python -m climate_model_tpu bench --micro [--baseline 3]
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig, baseline_config
from ..core.init import initialize
from .roofline import device_hbm_bw


def _time_chain(fn, init, iters: int, repeats: int = 3) -> float:
    """Best wall time [s] of a jitted ``lax.scan`` chain of ``fn``."""

    @jax.jit
    def chain(x):
        def body(carry, _):
            return fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    out = jax.block_until_ready(chain(init))   # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chain(out))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def micro_bench(baseline: int = 3, iters: int = 200,
                dtype: str = "float32", cfg: ModelConfig = None) -> dict:
    from ..kernels.fused_substep import (HALO, HALO_N, K2, lane_pad,
                                         make_fused_substep_packed,
                                         pick_block_rows, prog_k, radf_k,
                                         row_pad)
    from ..kernels.packing import pack_aux, pack_full
    from ..model import phys_epilogue_tuple
    from ..physics.packed import radiation_step_packed

    if cfg is None:
        cfg = baseline_config(baseline).replace(dtype=dtype,
                                                backend="pallas")
    gc, num, phys = cfg.grid, cfg.numerics, cfg.physics
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    dt_ = jnp.dtype(cfg.dtype)
    phys_tuple = phys_epilogue_tuple(cfg)
    with_phys = phys_tuple is not None
    bj = pick_block_rows(nz, ny, nx, same_base=False,
                         with_rad=phys.radiation, itemsize=dt_.itemsize,
                         with_phys=with_phys)
    state, forcing, grid = initialize(cfg)
    from ..core.grid import make_grid
    grid_np = make_grid(gc, num, np_mode=True)
    kw = dict(dy=float(grid_np.dy), ptop=gc.ptop,
              with_rad=phys.radiation,
              with_diff=bool(num.diff_uv or num.diff_pott or num.diff_moist),
              dtype=dt_, interpret=jax.default_backend() == "cpu")
    dt_val = float(grid_np.dt)
    pred_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=True,
                                       **kw)
    corr_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=False,
                                       phys=phys_tuple, **kw)

    aux = pack_aux(forcing, grid, bj, dt_)
    ps = pack_full(state, bj)
    radf = (ps.radf,) if phys.radiation else ()

    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    kp, kr = prog_k(nz), radf_k(nz)
    nt = -(-ny // bj)
    w = bj + HALO + (HALO_N if with_phys else HALO)
    nu = bj + 2 if with_phys else bj
    isz = dt_.itemsize

    def tile_bytes(same_base: bool) -> int:
        rows_k = w * kp                       # eval stream
        if not same_base:
            rows_k += w * K2 + nu * (kp - K2)  # base head + body
        if phys.radiation or with_phys:
            rows_k += w * (kr if phys.radiation else K2)
        rows_k += w * K2                      # aux2
        rows_k += bj * kp                     # output
        return rows_k * nxp * isz

    bw = device_hbm_bw(jax.devices()[0])
    dma_pred = nt * tile_bytes(True) / bw
    dma_corr = nt * tile_bytes(False) / bw

    # one full-tile VPU op = (w, nz, nxp) elements / 1024 lanes / 940 MHz
    tile_op_s = w * nz * nxp / 1024.0 / 0.94e9

    t_pred = _time_chain(lambda p: pred_k(p, *radf, aux.aux2, aux.geo,
                                          aux.vert, dt_val),
                         ps.prog, iters)
    t_corr = _time_chain(
        lambda p: corr_k(p, p, *((ps.radf,) if (phys.radiation or with_phys)
                                 else ()), aux.aux2, aux.geo, aux.vert,
                         dt_val),
        ps.prog, iters)
    t_rad = None
    if phys.radiation:
        import dataclasses
        cfg_every = dataclasses.replace(cfg.physics, rad_every_steps=1)
        cfg1 = cfg.replace(physics=cfg_every)
        t_rad = _time_chain(lambda s: radiation_step_packed(s, aux, cfg1, nz),
                            ps, iters)

    rep = {
        "config": f"{nx}x{ny}x{nz}", "bj": bj, "tiles": nt, "dtype": dtype,
        "pred_ms": round(t_pred * 1e3, 4),
        "corr_ms": round(t_corr * 1e3, 4),
        "pred_dma_floor_ms": round(dma_pred * 1e3, 4),
        "corr_dma_floor_ms": round(dma_corr * 1e3, 4),
        "pred_vs_dma": round(t_pred / dma_pred, 2),
        "corr_vs_dma": round(t_corr / dma_corr, 2),
        "pred_vpu_ops_per_tile": round(t_pred / nt / tile_op_s, 1),
        "corr_vpu_ops_per_tile": round(t_corr / nt / tile_op_s, 1),
    }
    if t_rad is not None:
        rep["rad_ms"] = round(t_rad * 1e3, 4)
        rep["rad_every_steps"] = phys.rad_every_steps
        rep["step_model_ms"] = round(
            (t_pred + t_corr + t_rad / max(phys.rad_every_steps, 1)) * 1e3, 4)
    return rep
