"""CLI driver.

TPU-native rebuild of the reference driver script ``solver.py`` (SURVEY.md
§2.1 [C] / §3.1): build grid + fields + physics, main loop with output,
restart and diagnostics on their intervals, final timing report. Design
departures (§7.1): argparse CLI over config presets (the reference had
``python solver.py`` with a hand-edited namelist module), fixed dt, stepping
in jitted ``lax.scan`` chunks sized to the output cadence, diagnostics
fetched per chunk, persistent XLA compilation cache.

Usage:
  python -m climate_model_tpu run --baseline 1 --days 1 --out-dir out/
  python -m climate_model_tpu run --nx 64 --ny 32 --nz 8 --physics all
  python -m climate_model_tpu bench --baseline 3
"""

from __future__ import annotations

import argparse
import os
import time


def _enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_config(args) -> "ModelConfig":
    from .core.config import (GridConfig, ModelConfig, NumericsConfig,
                              PhysicsConfig, baseline_config)
    if getattr(args, "config", None):
        from .core.namelist import load_config
        cfg = load_config(args.config)
    elif args.baseline:
        cfg = baseline_config(args.baseline)
    else:
        phys_on = args.physics == "all"
        cfg = ModelConfig(
            grid=GridConfig(nx=args.nx, ny=args.ny, nz=args.nz),
            physics=PhysicsConfig(
                microphysics=phys_on or "mic" in args.physics,
                radiation=phys_on or "rad" in args.physics,
                surface=phys_on or "srf" in args.physics,
                turbulence=phys_on or "turb" in args.physics),
            numerics=NumericsConfig(time_stepping=args.stepper),
        )
    if getattr(args, "dtype", None):
        cfg = cfg.replace(dtype=args.dtype)
    if getattr(args, "days", None) is not None:
        cfg = cfg.replace(sim_days=args.days)
    if getattr(args, "out_every_hours", None) is not None:
        cfg = cfg.replace(out_every_hours=args.out_every_hours)
    if getattr(args, "restart_every_days", None) is not None:
        cfg = cfg.replace(restart_every_days=args.restart_every_days)
    if getattr(args, "backend_override", None):
        cfg = cfg.replace(backend=args.backend_override)
    import dataclasses as _dc
    if getattr(args, "mesh_lat", None) or getattr(args, "mesh_lon", None):
        sh = cfg.sharding
        cfg = cfg.replace(sharding=_dc.replace(
            sh, mesh_lat=args.mesh_lat or sh.mesh_lat,
            mesh_lon=args.mesh_lon or sh.mesh_lon,
            mode=getattr(args, "sharding_mode", None) or sh.mode))
    elif getattr(args, "sharding_mode", None):
        cfg = cfg.replace(sharding=_dc.replace(
            cfg.sharding, mode=args.sharding_mode))
    if getattr(args, "halo_overlap", None):
        cfg = cfg.replace(sharding=_dc.replace(
            cfg.sharding, halo_overlap=True))
    if getattr(args, "diff", None) is not None:
        cfg = cfg.replace(numerics=_dc.replace(
            cfg.numerics, diff_uv=args.diff, diff_pott=args.diff,
            diff_moist=args.diff))
    if getattr(args, "adaptive_dt", False):
        cfg = cfg.replace(numerics=_dc.replace(cfg.numerics,
                                               adaptive_dt=True))
    if getattr(args, "convection", False):
        cfg = cfg.replace(physics=_dc.replace(cfg.physics, convection=True))
    if getattr(args, "topo", None):
        cfg = cfg.replace(topo=args.topo)
    if getattr(args, "topo_file", None):
        cfg = cfg.replace(topo_file=args.topo_file)
    from .core.config import resolve_rad_interval
    return resolve_rad_interval(cfg)


def cmd_run(args) -> int:
    _enable_cache()
    import jax

    from .core.init import initialize
    from .dycore.stepper import run_scan
    from .io.checkpoint import load_checkpoint_ex, save_checkpoint
    from .io.metrics import MetricsLogger, diagnostics
    from .io.netcdf import NCWriter

    cfg = build_config(args)
    if getattr(args, "multihost", False):
        # DCN multi-host runtime (SURVEY.md §2.2 comm-backend row): each
        # process owns its local TPU devices; collectives ride ICI within a
        # slice and DCN across hosts, all emitted by XLA.
        jax.distributed.initialize()
    state, forcing, grid = initialize(cfg)
    auto_ckpt = (os.path.join(args.out_dir, "restart.npz")
                 if args.out_dir else None)
    restart_from = args.restart_from
    if (not restart_from and getattr(args, "auto_resume", False)
            and auto_ckpt and (os.path.exists(auto_ckpt)
                               or os.path.exists(auto_ckpt + ".p0"))):
        # failure-recovery loop (SURVEY.md §5 failure-detection row):
        # a relaunched run picks up its own last periodic checkpoint
        restart_from = auto_ckpt
    if restart_from:
        state, mismatch = load_checkpoint_ex(
            restart_from, cfg, force=getattr(args, "force_resume", False))
        print(f"resumed from {restart_from} at step {int(state.step)}")
        if mismatch and args.out_dir and jax.process_index() == 0:
            # persist the branch provenance (ADVICE r4): a --force-resume
            # from a mismatched config is a deliberate experiment branch,
            # and its lineage should outlive transient stdout
            import json as _json
            os.makedirs(args.out_dir, exist_ok=True)
            with open(os.path.join(args.out_dir, "forced_branch.jsonl"),
                      "a") as f:
                f.write(_json.dumps(dict(
                    time=time.strftime("%Y-%m-%dT%H:%M:%S"),
                    restart_from=restart_from, step=int(state.step),
                    mismatch=mismatch)) + "\n")

    dt = float(grid.dt)
    n_total = max(int(cfg.sim_days * 86400.0 / dt), 1)
    chunk = min(max(int(cfg.out_every_hours * 3600.0 / dt), 1), n_total)
    gc = cfg.grid
    # diagnostics are replicated: log/print on process 0 only (SURVEY.md §5
    # metrics row: "step-line (throttled, host 0)")
    p0 = jax.process_index() == 0
    logger = MetricsLogger(
        jsonl_path=os.path.join(args.out_dir, "metrics.jsonl")
        if args.out_dir and p0 else None,
        grid_points=gc.nx * gc.ny * gc.nz, quiet=not p0)
    # fresh run truncates a stale metrics file; resume drops superseded
    # future lines (no duplicate steps across sessions — VERDICT r3 #6)
    logger.begin_session(int(state.step))
    writer = (NCWriter(args.out_dir)
              if args.out_dir and not getattr(args, "no_nc", False) else None)
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    # (before sharding: a sharded grid.dx may not be fully addressable)
    min_dx = float(min(jax.numpy.min(grid.dx), grid.dy))

    # --- multi-device domain decomposition (BASELINE configs #4/#5) ---
    sh = cfg.sharding
    n_mesh = sh.mesh_lat * sh.mesh_lon
    mesh = None
    if n_mesh > 1:
        from .dist.mesh import make_mesh
        from .dist.sharding import shard_inputs
        if cfg.backend == "pallas" and sh.mode != "shard_map":
            # GSPMD cannot auto-partition a pallas_call; the fused kernels
            # compose with the mesh only via the explicit shard_map halo
            # path — switch to it rather than silently benchmarking the
            # ~3x slower jnp fallback.
            print("note: pallas backend on a device mesh requires sharding "
                  "mode 'shard_map'; switching mode auto -> shard_map")
            import dataclasses as _dc
            cfg = cfg.replace(sharding=_dc.replace(sh, mode="shard_map"))
            sh = cfg.sharding
        mesh = make_mesh(cfg)
        state, grid, forcing = shard_inputs(mesh, state, grid, forcing)

    # grid/forcing ride as jit ARGUMENTS below: closing over a multi-process
    # sharded array is a jit error (non-addressable constant), and the
    # adaptive-dt loop swaps grid.dt between chunks without retracing.
    # Programs are built per scan length: the horizon rarely divides into
    # whole chunks, so the final partial chunk gets its own (cached)
    # program and the run executes EXACTLY the requested steps.
    shard_mapped = mesh is not None and sh.mode == "shard_map"

    def build_run(n_steps: int):
        if shard_mapped:
            if cfg.backend == "pallas":
                from .dist.packed_halo import make_packed_sharded_runner
                stepper = make_packed_sharded_runner(cfg, mesh, grid,
                                                     n_steps=n_steps)
            else:
                from .dist.halo import make_sharded_step_fn
                stepper = make_sharded_step_fn(cfg, mesh, grid,
                                               n_steps=n_steps)
        else:
            # single device, or GSPMD auto-partitioning over sharded inputs
            from .model import make_chunk_runner
            stepper = make_chunk_runner(cfg, n_steps)

        @jax.jit
        def run_chunk(s, g, f):
            s = stepper(s, g, f)
            return s, diagnostics(s, g, f, cfg)

        return run_chunk

    programs = {}

    def run_for(n_steps: int):
        if n_steps not in programs:
            programs[n_steps] = build_run(n_steps)
        return programs[n_steps]

    mesh_info = (f"  mesh={sh.mesh_lat}x{sh.mesh_lon} ({sh.mode})"
                 if mesh is not None else "")
    if p0:
        print(f"grid {gc.nx}x{gc.ny}x{gc.nz}  dt={dt:.1f}s  steps={n_total}  "
              f"chunk={chunk}  device={jax.devices()[0].platform}{mesh_info}",
              flush=True)
    t0 = time.time()
    start = done = int(state.step)   # nonzero on resume: run the REMAINDER
    logger._step_last = done         # gp/s accounting = THIS session's steps
    restart_every = max(int(cfg.restart_every_days * 86400.0 / dt), 1)
    next_restart = (done // restart_every + 1) * restart_every
    # Adaptive dt (reference solver.py per-step CFL/max-wind dt, SURVEY.md
    # §3.1): re-evaluated per chunk from the chunk diagnostics' max wind —
    # no extra device sync. The horizon becomes sim-time-based; output/
    # restart cadences stay step-based from the initial dt.
    adaptive = cfg.numerics.adaptive_dt
    horizon = cfg.sim_days * 86400.0
    import dataclasses as _dc
    # Adaptive loop condition: a dt-proportional tolerance (not a fixed
    # epsilon — fp32 t resolves only ~4 ms at day scales), so the run ends
    # within half a step of the horizon instead of forcing one extra step
    # when t lands epsilon-short (ADVICE r3).
    def more():
        return (float(state.t) < horizon - 0.5 * float(grid.dt)) \
            if adaptive else (done < n_total)

    while more():
        if adaptive:
            # exact horizon in adaptive mode too: clamp the tail chunk to
            # the steps remaining at the CURRENT dt (recomputed per chunk).
            # ROUND, don't ceil: with the half-step loop tolerance above,
            # rounding lands the final t within dt/2 of the horizon on
            # either side (ceil could overshoot by up to a full step when
            # the remainder was just over half a step — ADVICE r3).
            left = round((horizon - float(state.t)) / float(grid.dt))
            n = min(chunk, max(1, left))
        else:
            n = min(chunk, n_total - done)
        state, diag = run_for(n)(state, grid, forcing)
        state = jax.block_until_ready(state)
        done += n
        rec = logger.log_chunk(
            diag, extra={"dt": float(grid.dt)} if adaptive else None)
        if rec["nan"]:
            print("!! non-finite state detected; aborting", flush=True)
            return 2
        if adaptive:
            from .core.grid import adaptive_cfl_dt
            dt_new = adaptive_cfl_dt(min_dx, cfg.numerics.cfl,
                                     rec["max_wind"])
            dt_new = max(dt_new, 0.05 * dt)   # floor against a wind spike
            grid = _dc.replace(grid, dt=jax.numpy.asarray(
                dt_new, grid.dt.dtype))
        if writer:
            writer.write(state, grid, forcing)
        if args.out_dir and done >= next_restart:
            save_checkpoint(os.path.join(args.out_dir, "restart.npz"),
                            state, cfg)
            next_restart += restart_every
    wall = time.time() - t0
    gps = gc.nx * gc.ny * gc.nz * (done - start) / wall
    if p0:
        print(f"done: {done - start} steps in {wall:.1f}s  "
              f"({gps/1e6:.2f} M grid-points/s)", flush=True)
    if args.out_dir:
        save_checkpoint(os.path.join(args.out_dir, "restart.npz"), state, cfg)
    return 0


def cmd_plot(args) -> int:
    from .io.plot import (quicklook_nc, quicklook_npz, timeseries_jsonl,
                          zonal_mean_npz)
    out = args.out or (args.nc.rsplit(".", 1)[0] + ".png")
    if args.nc.endswith(".jsonl"):      # run metrics -> climate time series
        print(timeseries_jsonl(args.nc, out))
        return 0
    if args.nc.endswith(".npz"):        # restart checkpoint (--no-nc runs)
        grid_cfg = None
        if args.config or args.baseline:
            grid_cfg = build_config(args).grid
        if getattr(args, "zonal", False):
            print(zonal_mean_npz(args.nc, out, grid_cfg=grid_cfg))
        else:
            print(quicklook_npz(args.nc, out, level=args.level,
                                grid_cfg=grid_cfg))
    else:
        print(quicklook_nc(args.nc, out, level=args.level))
    return 0


def cmd_profile(args) -> int:
    _enable_cache()
    cfg = build_config(args)
    from .bench.profile import profile_subsystems
    profile_subsystems(cfg, trace_dir=args.trace_dir)
    return 0


def cmd_bench(args) -> int:
    _enable_cache()
    import json
    if args.micro:
        from .bench.micro import micro_bench
        result = micro_bench(baseline=args.baseline, iters=args.steps,
                             dtype=args.dtype or "float32")
    elif args.scaling:
        from .bench.scaling import measure_scaling
        args.baseline = args.baseline or 3
        cfg = build_config(args)       # applies --config/--baseline/--dtype/--diff
        if args.backend:
            cfg = cfg.replace(backend=args.backend)
        if getattr(args, "halo_overlap", False):
            if cfg.backend != "pallas":
                # only the packed-Pallas path implements the explicit
                # overlap schedule (dist/packed_halo.py); refuse rather
                # than print a "measurement" of the blocking path
                print("error: --halo-overlap requires backend=pallas "
                      "(dist/halo.py's jnp path has no explicit overlap "
                      "schedule to measure)")
                return 2
            import dataclasses as _dc
            cfg = cfg.replace(sharding=_dc.replace(cfg.sharding,
                                                   halo_overlap=True))
        result = measure_scaling(cfg, steps=args.steps)
    elif args.stability:
        from .bench.stability import probe_stability
        from .core.config import baseline_config
        # build_config handles --config/--baseline and the --dtype/--diff
        # overrides; only --backend is bench-specific here
        args.baseline = args.baseline or 3
        cfg = build_config(args)
        if args.backend:
            cfg = cfg.replace(backend=args.backend)
        result = probe_stability(cfg, steps=args.steps, chunk=args.chunk)
        result.pop("trajectory", None)   # keep the JSON line one line
    else:
        from .bench.throughput import run_benchmark
        result = run_benchmark(baseline=args.baseline, steps=args.steps,
                               dtype=args.dtype or "float32",
                               backend=args.backend)
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="climate_model_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a simulation")
    pr.add_argument("--config", default=None,
                    help="TOML namelist (see configs/*.toml)")
    pr.add_argument("--baseline", type=int, default=0,
                    help="BASELINE.md milestone config 1..5")
    pr.add_argument("--nx", type=int, default=64)
    pr.add_argument("--ny", type=int, default=32)
    pr.add_argument("--nz", type=int, default=8)
    pr.add_argument("--physics", default="none",
                    help="'none', 'all', or comma list of mic,rad,srf,turb")
    pr.add_argument("--stepper", default="matsuno",
                    choices=["matsuno", "euler", "rk4"])
    pr.add_argument("--days", type=float, default=None)
    pr.add_argument("--dtype", default=None)
    pr.add_argument("--out-dir", default=None)
    pr.add_argument("--out-every-hours", type=float, default=None,
                    help="NetCDF output cadence (i_out_nth_hour analogue). "
                         "A cadence whose step-chunk divides the horizon "
                         "avoids compiling a second (tail) scan program")
    pr.add_argument("--restart-every-days", type=float, default=None,
                    help="checkpoint cadence (i_restart_nth_day analogue)")
    pr.add_argument("--restart-from", default=None)
    pr.add_argument("--force-resume", action="store_true",
                    help="resume even if the checkpoint's config "
                         "fingerprint mismatches (branch a physics-"
                         "perturbation experiment from a common spin-up; "
                         "warns loudly instead of refusing)")
    pr.add_argument("--auto-resume", action="store_true",
                    help="resume from this out-dir's own last periodic "
                         "checkpoint if one exists (failure-recovery loop: "
                         "relaunch with identical arguments after a crash)")
    pr.add_argument("--backend", dest="backend_override", default=None,
                    choices=["jnp", "pallas"])
    pr.add_argument("--mesh-lat", type=int, default=0,
                    help="device-mesh latitude extent (domain decomposition)")
    pr.add_argument("--mesh-lon", type=int, default=0,
                    help="device-mesh longitude extent")
    pr.add_argument("--sharding-mode", default=None,
                    choices=["auto", "shard_map"],
                    help="GSPMD auto-partitioning vs explicit shard_map halos")
    pr.add_argument("--multihost", action="store_true",
                    help="initialize the jax multi-host (DCN) runtime")
    pr.add_argument("--halo-overlap", action="store_true",
                    help="overlap halo exchange with interior compute "
                         "(shard_map mode)")
    pr.add_argument("--diff", type=float, default=None,
                    help="override all horizontal-diffusion coefficients "
                         "[m2/s] (presets carry scale-aware defaults)")
    pr.add_argument("--adaptive-dt", action="store_true",
                    help="recompute dt per chunk from CFL and the current "
                         "max wind (reference per-step dt; both backends — "
                         "the fused kernel takes dt as a runtime operand)")
    pr.add_argument("--convection", action="store_true",
                    help="enable the moist-convective mixing guard "
                         "(physics.convection; default off for reference "
                         "parity — see PhysicsConfig)")
    pr.add_argument("--topo", default=None,
                    choices=["gaussian_mountain", "aquaplanet", "continents"],
                    help="synthetic topography/land configuration "
                         "(core/init.py; 'continents' is the procedural "
                         "Earth-like layout, land fraction ~0.28)")
    pr.add_argument("--topo-file", default=None,
                    help="NetCDF elevation file regridded to the model "
                         "grid (io/topo.py; reference ETOPO-input parity) "
                         "— overrides --topo")
    pr.add_argument("--no-nc", action="store_true",
                    help="skip NetCDF field dumps (JSONL metrics + restart "
                         "checkpoints only — e.g. when the device->host "
                         "link is slow relative to the field volume)")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    pb.add_argument("--config", default=None)
    pb.add_argument("--days", type=float, default=None)
    pb.add_argument("--dtype", default=None)
    pb.add_argument("--scaling", action="store_true",
                    help="measure 1-device vs full-mesh scaling efficiency")
    pb.add_argument("--micro", action="store_true",
                    help="per-kernel scan-chained micro-benchmark")
    pb.add_argument("--stability", action="store_true",
                    help="long-run blow-up probe (max-wind trajectory)")
    pb.add_argument("--diff", type=float, default=None,
                    help="override all horizontal-diffusion coefficients "
                         "(stability probe)")
    pb.add_argument("--chunk", type=int, default=100,
                    help="steps per diagnostics fetch (stability probe)")
    pb.add_argument("--halo-overlap", action="store_true",
                    help="use the halo/compute-overlap schedule in the "
                         "scaling measurement")
    pb.add_argument("--baseline", type=int, default=3)
    pb.add_argument("--steps", type=int, default=50)
    pb.add_argument("--backend", default=None,
                    choices=["jnp", "pallas"],
                    help="override the preset's backend")
    pb.set_defaults(fn=cmd_bench)

    pp = sub.add_parser("profile",
                        help="per-subsystem timing breakdown (+ trace)")
    pp.add_argument("--config", default=None)
    pp.add_argument("--baseline", type=int, default=0)
    pp.add_argument("--nx", type=int, default=64)
    pp.add_argument("--ny", type=int, default=32)
    pp.add_argument("--nz", type=int, default=8)
    pp.add_argument("--physics", default="all")
    pp.add_argument("--stepper", default="matsuno")
    pp.add_argument("--days", type=float, default=None)
    pp.add_argument("--dtype", default=None)
    pp.add_argument("--backend", dest="backend_override", default=None,
                    choices=["jnp", "pallas"])
    pp.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler trace here")
    pp.set_defaults(fn=cmd_profile)

    pl_ = sub.add_parser("plot", help="quicklook PNG from an out_XXXX.nc, "
                                      "a restart.npz checkpoint, or a "
                                      "metrics.jsonl (climate time series)")
    pl_.add_argument("nc")
    pl_.add_argument("--out", default=None)
    pl_.add_argument("--level", type=int, default=-1)
    pl_.add_argument("--zonal", action="store_true",
                     help="zonal-mean cross-sections (u/T/q vs lat-sigma) "
                          "instead of the map quicklook (npz input)")
    pl_.add_argument("--config", default=None,
                     help="run's TOML namelist (checkpoint quicklooks: "
                          "supplies ptop + lat/lon extents)")
    pl_.add_argument("--baseline", type=int, default=0,
                     help="run's baseline preset (same purpose)")
    pl_.set_defaults(fn=cmd_plot)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
