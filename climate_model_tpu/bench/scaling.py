"""Scaling-efficiency harness (BASELINE.md: >= 80% grid-points/s scaling
efficiency from 1 chip to N hosts).

Measures throughput of the SAME global problem... no — scaling here is weak
scaling per BASELINE's metric (grid-points/s at fixed resolution per config):
we time the domain-decomposed step on 1 device and on the full mesh and
report efficiency = (gps_N / gps_1) / N.

On this dev box only one real TPU chip exists; the harness runs on whatever
devices are visible (real pod slices in production; virtual CPU devices in
tests validate the plumbing, not the bandwidth).
"""

from __future__ import annotations

import time

import jax

from ..core.config import ModelConfig
from ..core.init import initialize
from ..dist.halo import make_sharded_step_fn
from ..dist.mesh import make_mesh
from ..dist.sharding import shard_inputs
from ..dycore.stepper import run_scan
from ..model import make_step_fn


def _time_run(run, state, *args, steps, repeats=3):
    out = jax.block_until_ready(run(state, *args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(state, *args))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def measure_scaling(cfg: ModelConfig, steps: int = 10,
                    mode: str = "shard_map") -> dict:
    """Time 1-device vs full-mesh runs of cfg's grid; returns gps + efficiency."""
    gc = cfg.grid
    npts = gc.nx * gc.ny * gc.nz
    n_dev = cfg.sharding.mesh_lat * cfg.sharding.mesh_lon

    # single device
    from ..model import make_chunk_runner
    cfg1 = cfg.replace(sharding=cfg.sharding.__class__(mesh_lat=1, mesh_lon=1))
    state, forcing, grid = initialize(cfg1)
    run1 = jax.jit(make_chunk_runner(cfg1, steps))
    t1 = _time_run(run1, state, grid, forcing, steps=steps)

    # full mesh (pallas: fused kernels + ppermute ghost refresh; jnp:
    # shift-level ppermute halos — both inside one shard_map region)
    use_pallas = cfg.backend == "pallas" and mode == "shard_map"
    cfgn = cfg if use_pallas else cfg.replace(backend="jnp")
    state, forcing, grid = initialize(cfgn)
    mesh = make_mesh(cfgn)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    if use_pallas:
        from ..dist.packed_halo import make_packed_sharded_runner
        runn = make_packed_sharded_runner(cfgn, mesh, grid, n_steps=steps)
    elif mode == "shard_map":
        runn = make_sharded_step_fn(cfgn, mesh, grid, n_steps=steps)
    else:
        stepn = make_step_fn(cfgn)
        runn = jax.jit(lambda s_, g_, f_: run_scan(stepn, s_, g_, f_, steps))
    tn = _time_run(runn, s, g, f, steps=steps)

    gps1 = npts / t1
    gpsn = npts / tn
    eff = (gpsn / gps1) / n_dev
    return {
        "metric": f"scaling efficiency 1->{n_dev} devices "
                  f"({gc.nx}x{gc.ny}x{gc.nz}, {mode})",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.80, 4),   # BASELINE target: >= 0.80
        "gps_1dev": round(gps1, 1),
        "gps_ndev": round(gpsn, 1),
        # N-device / 1-device throughput. On VIRTUAL CPU devices (tests on
        # this box) the N "devices" share the same physical cores, so
        # ``value`` (which divides by N) is structurally meaningless there;
        # gps_ratio isolates the sharding/communication overhead instead
        # (1.0 = sharding costs nothing on shared cores).
        "gps_ratio": round(gpsn / gps1, 4),
        "n_devices": n_dev,
    }
