"""Corrector substep + 1-step packed scan (dyn only) on REAL TPU vs jnp."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, NumericsConfig
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initial_state_np
from climate_model_tpu.core.state import State, Forcing
from climate_model_tpu.dycore.tendencies import proceed, tendencies
from climate_model_tpu.kernels.fused_substep import GEO_FIELDS, make_fused_substep

nx, ny, nz, bj = 64, 32, 8, 8
cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, nz=nz), dtype="float32")
st, fo, grid_np = initial_state_np(cfg)
r = np.random.default_rng(0)
st["u"] += r.normal(0, 1.0, st["u"].shape)
v = st["v"] + r.normal(0, 1.0, st["v"].shape); v[:, 0, :] = 0.0; st["v"] = v
st["pott"] += r.normal(0, 1.0, st["pott"].shape)
st["qv"] = np.abs(st["qv"])
grid = make_grid(cfg.grid, cfg.numerics, dtype=jnp.float32)
f32 = lambda x: jnp.asarray(x, jnp.float32)
state = State(u=f32(st["u"]), v=f32(st["v"]), colp=f32(st["colp"]),
              pott=f32(st["pott"]), qv=f32(st["qv"]), qc=f32(st["qc"]),
              tsurf=f32(st["tsurf"]), rain=f32(np.zeros((ny,nx))),
              soil_moist=f32(st["soil_moist"]),
              dpottdt_rad=jnp.zeros((nz,ny,nx), jnp.float32),
              swflx_sfc=jnp.zeros((ny,nx), jnp.float32),
              lwflx_sfc=jnp.zeros((ny,nx), jnp.float32),
              t=jnp.zeros(()), step=jnp.zeros((), jnp.int32))
forcing = Forcing(hsurf=f32(fo["hsurf"]), land_mask=f32(fo["land_mask"]),
                  albedo=f32(fo["albedo"]), evap_eff=f32(fo["evap_eff"]))
dt = float(grid_np.dt)
t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
pred = proceed(state, t1, dt)
t2 = tendencies(pred, state.colp, dt, grid, forcing, cfg)
ref = proceed(state, t2, dt)
geo = jnp.stack([getattr(grid, f) for f in GEO_FIELDS], axis=1)

sub = make_fused_substep(nz, ny, nx, bj=bj, same_base=False, dt=dt,
                         dy=float(grid_np.dy), ptop=grid.ptop, with_rad=False,
                         dtype=jnp.float32, interpret=False)
out = jax.block_until_ready(jax.jit(sub)(
    pred.u, pred.v, pred.pott, pred.qv, pred.qc, pred.colp,
    forcing.hsurf, geo,
    state.u, state.v, state.pott, state.qv, state.qc, state.colp))
print("corrector substep:", flush=True)
for name, got in zip(("u","v","pott","qv","qc","colp"), out):
    a = np.asarray(got); b = np.asarray(getattr(ref, name))
    print(f"  {name}: nonfinite={(~np.isfinite(a)).sum()}/{a.size} maxdiff={np.nanmax(np.abs(a-b)):.3e}", flush=True)

# full packed model step, dynamics only, 1 and 3 steps
from climate_model_tpu.model import make_run_fn
from climate_model_tpu.dycore.stepper import dynamics_step_fn, run_scan
cfgp = cfg.replace(backend="pallas")
for n in (1, 3):
    outp = jax.block_until_ready(make_run_fn(cfgp, n, donate=False)(state, grid, forcing))
    stj = state
    stepj = dynamics_step_fn(cfg)
    for _ in range(n):
        stj = stepj(stj, grid, forcing)
    print(f"packed scan {n} step(s), dyn only:", flush=True)
    for name in ("u","v","pott","qv","qc","colp"):
        a = np.asarray(getattr(outp, name)); b = np.asarray(getattr(stj, name))
        bad = (~np.isfinite(a)).sum()
        print(f"  {name}: nonfinite={bad}/{a.size} maxdiff={np.nanmax(np.abs(a-b)):.3e}", flush=True)
