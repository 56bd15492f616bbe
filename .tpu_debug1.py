import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.model import make_run_fn

def probe(nx, ny, nz, steps=50, phys=True, backend="pallas"):
    cfg = ModelConfig(
        grid=GridConfig(nx=nx, ny=ny, nz=nz),
        physics=PhysicsConfig(microphysics=phys, radiation=phys, surface=phys,
                              turbulence=phys, rad_every_steps=6),
        dtype="float32", backend=backend)
    s, f, g = initialize(cfg)
    out = jax.block_until_ready(make_run_fn(cfg, steps, donate=False)(s, g, f))
    u = np.asarray(out.u)
    fin = all(np.isfinite(np.asarray(getattr(out, n))).all()
              for n in ("u","v","colp","pott","qv","qc","tsurf","rain","soil_moist"))
    print(f"{backend} {nx}x{ny}x{nz} phys={phys} steps={steps}: finite={fin} "
          f"max|u|={np.abs(u).max():.3f}", flush=True)
    return out

probe(64, 32, 8)
probe(128, 64, 16)
probe(360, 180, 32, steps=10)
probe(360, 180, 32, steps=10, phys=False)
