import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig, NumericsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore.stepper import run_scan
from climate_model_tpu.model import make_step_fn

nx, ny, nz = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
phys = sys.argv[4] == "phys"
diff = float(sys.argv[5])
cfg = ModelConfig(
    grid=GridConfig(nx=nx, ny=ny, nz=nz),
    physics=PhysicsConfig(microphysics=phys, radiation=phys, surface=phys,
                          turbulence=phys, rad_every_steps=6),
    numerics=NumericsConfig(diff_uv=diff, diff_pott=diff, diff_moist=diff),
    dtype="float32")
state, forcing, grid = initialize(cfg)
step = make_step_fn(cfg)
run = jax.jit(lambda s: run_scan(step, s, grid, forcing, 50))
print(f"dt={float(grid.dt):.1f}s", flush=True)
for i in range(60):
    state = jax.block_until_ready(run(state))
    u = np.asarray(state.u); v = np.asarray(state.v)
    mu, mv = np.abs(u).max(), np.abs(v).max()
    ju = np.unravel_index(np.abs(v).argmax(), v.shape)
    print(f"step {50*(i+1):5d} max|u| {mu:9.3f} max|v| {mv:9.3f} at k={ju[0]} j={ju[1]} "
          f"pott[{np.asarray(state.pott).min():7.1f},{np.asarray(state.pott).max():7.1f}]", flush=True)
    if not np.isfinite(mu) or mu > 300: break
