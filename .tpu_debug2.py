import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.model import make_run_fn

cfgj = ModelConfig(grid=GridConfig(nx=64, ny=32, nz=8),
                   physics=PhysicsConfig(microphysics=True, radiation=True,
                                         surface=True, turbulence=True,
                                         rad_every_steps=6),
                   dtype="float32", backend="jnp")
s, f, g = initialize(cfgj)
outj = jax.block_until_ready(make_run_fn(cfgj, 50, donate=False)(s, g, f))
finj = all(np.isfinite(np.asarray(getattr(outj, n))).all()
           for n in ("u","v","colp","pott","qv","qc","tsurf","rain","soil_moist"))
print(f"jnp-on-TPU 64x32x8 phys 50 steps: finite={finj} max|u|={np.abs(np.asarray(outj.u)).max():.3f}", flush=True)

# one step, pallas vs jnp, per-field diff
cfgp = cfgj.replace(backend="pallas")
o1j = jax.block_until_ready(make_run_fn(cfgj, 1, donate=False)(s, g, f))
o1p = jax.block_until_ready(make_run_fn(cfgp, 1, donate=False)(s, g, f))
for n in ("u","v","colp","pott","qv","qc","tsurf","rain","soil_moist"):
    a, b = np.asarray(getattr(o1p, n)), np.asarray(getattr(o1j, n))
    bad = (~np.isfinite(a)).sum()
    d = np.abs(a - b)
    dm = np.nanmax(d) if np.isfinite(d).any() else float("nan")
    loc = np.unravel_index(np.nanargmax(np.where(np.isfinite(d), d, -1)), d.shape)
    print(f"  step1 {n}: nonfinite={bad} maxdiff={dm:.3e} at {loc}", flush=True)
