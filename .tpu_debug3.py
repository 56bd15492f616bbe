import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.model import make_run_fn

def probe(nx, ny, nz, steps, phys):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, nz=nz),
                      physics=PhysicsConfig(microphysics=phys, radiation=phys,
                                            surface=phys, turbulence=phys,
                                            rad_every_steps=6),
                      dtype="float32", backend="pallas")
    s, f, g = initialize(cfg)
    out = jax.block_until_ready(make_run_fn(cfg, steps, donate=False)(s, g, f))
    fields = ("u","v","colp","pott","qv","qc","tsurf","rain","soil_moist")
    nf = {n: int((~np.isfinite(np.asarray(getattr(out, n)))).sum()) for n in fields}
    print(f"{nx}x{ny}x{nz} phys={phys} steps={steps}: "
          + (" ".join(f"{n}:{v}" for n, v in nf.items() if v) or "ALL FINITE")
          + f"  max|u|={np.nanmax(np.abs(np.asarray(out.u))):.3f}", flush=True)

probe(360, 180, 32, 1, False)
probe(64, 32, 8, 50, False)
probe(64, 32, 8, 10, True)
