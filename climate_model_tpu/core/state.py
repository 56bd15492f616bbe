"""Model state pytrees.

TPU-native rebuild of the reference's ``fields.py`` / ``CPU_Fields`` /
``GPU_Fields`` (SURVEY.md §2.1 [C]). Design departure (SURVEY.md §7.1): the
reference preallocates big mutable arrays with a physical 1-cell halo and
kernels write into them in place; here the state is an immutable pytree of
halo-free ``(nz, ny, nx)`` arrays threaded functionally through
``step: (State, Grid, Forcing) -> State`` inside ``lax.scan``. Halos exist
only shard-locally, materialized by collectives (dist/halo.py).

There is no CPU/GPU twin and no host<->device copy management: placement and
sharding are handled by jax device placement (the reference's ``GPU_Fields``
``.to_device()`` idiom has no equivalent obligation beyond ``jax.device_put``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Prognostic model state (+ slow-physics caches).

    Shapes: 3-D fields ``(nz, ny, nx)``, 2-D fields ``(ny, nx)``.
    See core/grid.py for the staggering convention.
    """

    u: jax.Array       # zonal wind at west faces [m s-1]
    v: jax.Array       # meridional wind at south faces [m s-1]; v[:,0,:] = 0
    colp: jax.Array    # column pressure p_surf - p_top [Pa], cell centers
    pott: jax.Array    # potential temperature [K]
    qv: jax.Array      # water-vapor mixing ratio [kg kg-1]
    qc: jax.Array      # cloud-water mixing ratio [kg kg-1]
    tsurf: jax.Array   # surface/soil temperature [K], (ny, nx)
    rain: jax.Array    # accumulated surface precipitation [kg m-2], (ny, nx)
    soil_moist: jax.Array  # prognostic soil water [m], (ny, nx); fed by rain,
                           # depleted by evaporation (physics/surface.py)
    # Slow-physics caches: radiation runs every N steps (reference
    # ``i_rad_nth_hour`` interval, SURVEY.md §2.1 radiation row) and its
    # heating/surface fluxes are held constant in between.
    dpottdt_rad: jax.Array   # radiative heating of POTT [K s-1], (nz, ny, nx)
    swflx_sfc: jax.Array     # net shortwave absorbed at surface [W m-2], (ny, nx)
    lwflx_sfc: jax.Array     # net longwave at surface (down-up) [W m-2], (ny, nx)
    t: jax.Array             # sim time [s], scalar
    step: jax.Array          # step counter, int32 scalar

    @property
    def dtype(self):
        return self.u.dtype

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Forcing:
    """Static surface/boundary fields (reference topography + land-sea mask,
    SURVEY.md §2.3)."""

    hsurf: jax.Array       # surface elevation [m], (ny, nx)
    land_mask: jax.Array   # 1.0 = land, 0.0 = ocean, (ny, nx)
    albedo: jax.Array      # surface albedo, (ny, nx)
    evap_eff: jax.Array    # surface evaporation efficiency 0..1, (ny, nx)

    def replace(self, **kw) -> "Forcing":
        return dataclasses.replace(self, **kw)


def zeros_state(nz: int, ny: int, nx: int, dtype=jnp.float32) -> State:
    z3 = jnp.zeros((nz, ny, nx), dtype)
    z2 = jnp.zeros((ny, nx), dtype)
    return State(
        u=z3, v=z3, colp=z2, pott=z3 + 300.0, qv=z3, qc=z3,
        tsurf=z2 + 288.0, rain=z2, soil_moist=z2 + 0.01,
        dpottdt_rad=z3, swflx_sfc=z2, lwflx_sfc=z2,
        t=jnp.zeros((), dtype), step=jnp.zeros((), jnp.int32),
    )
