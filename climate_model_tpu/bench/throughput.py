"""Throughput benchmark harness.

Measures grid-points/s/chip (BASELINE.json headline metric) for a jitted
multi-step scan on the current default device, and reports the fraction of
the HBM speed-of-light roofline (bench/roofline.py) as ``vs_baseline``
(the reference publishes no numbers — BASELINE.md; speed-of-light fraction
is the defined baseline).
"""

from __future__ import annotations

import time

import jax

from ..core.config import baseline_config
from ..core.init import initialize
from ..model import make_chunk_runner
from .roofline import speed_of_light_gps


def run_benchmark(baseline: int = 3, steps: int = 50, dtype: str = "float32",
                  repeats: int = 3, backend: str = "jnp") -> dict:
    cfg = baseline_config(baseline).replace(dtype=dtype, backend=backend)
    state, forcing, grid = initialize(cfg)
    runner = make_chunk_runner(cfg, steps)

    @jax.jit
    def run(s):
        return runner(s, grid, forcing)

    # compile + warmup
    state = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)

    gc = cfg.grid
    npoints = gc.nx * gc.ny * gc.nz
    gps = npoints * steps / best
    dev = jax.devices()[0]
    dtype_bytes = 4 if dtype == "float32" else 8
    sol = speed_of_light_gps(dev, gc.nz, dtype_bytes,
                             cfg.numerics.time_stepping,
                             physics=cfg.physics.microphysics)
    return {
        "metric": f"grid-points/s/chip (baseline config #{baseline}, "
                  f"{gc.nx}x{gc.ny}x{gc.nz}, {cfg.numerics.time_stepping}, "
                  f"physics={'on' if cfg.physics.microphysics else 'off'}, "
                  f"backend={backend})",
        "value": round(gps, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(gps / sol, 4),
        "step_time_ms": round(best / steps * 1e3, 3),
        "device": str(dev.device_kind),
        "speed_of_light_gps": round(sol, 1),
    }
