"""Grid geometry: staggered lat-lon horizontal grid + sigma vertical coordinate.

TPU-native rebuild of the reference ``grid.py`` / ``main_grid.py`` (SURVEY.md
§2.1: lat/lon centers + staggered coords, metric terms dx(lat) / dy, cell area
A, Coriolis parameter, sigma level arrays, halo width nb=1 [C]).

Storage convention (chosen so every prognostic array has the SAME shape
``(nz, ny, nx)`` — uniform shapes keep shard-local blocks identical across the
device mesh and keep ``nx`` on the TPU 128-lane dimension; SURVEY.md §7.4
hard-part #2):

  * scalars (COLP, POTT, QV, QC):  cell centers ``(j, i)``.
  * UWIND ``u[k, j, i]``: zonal wind at the WEST face of cell ``(j, i)``.
    Longitude is periodic, so the east face of cell ``nx-1`` is ``u[..., 0]``.
  * VWIND ``v[k, j, i]``: meridional wind at the SOUTH face of cell ``(j, i)``.
    The domain has rigid walls at ``lat0``/``lat1`` (the reference's polar-row
    handling): ``v[:, 0, :] == 0`` is enforced, and the north face of row
    ``ny-1`` (the north wall) is identically zero and not stored.
  * vertical: ``nz`` sigma layers, borders ``k = 0..nz`` with
    ``sigma = (p - ptop) / COLP`` (0 at model top, 1 at the surface).
    WWIND (sigma-dot) lives on borders; border 0 and border nz are zero and
    interior borders ``1..nz-1`` are stored in arrays of shape
    ``(nz + 1, ny, nx)`` where convenient.

The grid is built once on host in float64 and materialized as a pytree of
arrays at the working dtype; it is passed as an argument to jitted step
functions (not closed over) so it shards with the state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as c
from .config import GridConfig, NumericsConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Static geometry pytree. 1-D arrays are per-latitude unless noted."""

    # data fields (arrays, participate in the pytree)
    lat: jax.Array        # (ny,)   cell-center latitude [rad]
    lats: jax.Array       # (ny,)   south-face (v-row) latitude [rad]; lats[0]=south wall
    lon: jax.Array        # (nx,)   cell-center longitude [rad]
    lonu: jax.Array       # (nx,)   u-face longitude [rad]
    dx: jax.Array         # (ny,)   zonal grid spacing at cell centers [m]
    dxs: jax.Array        # (ny,)   zonal grid spacing at v faces (south) [m]
    dy: jax.Array         # ()      meridional grid spacing [m]
    area: jax.Array       # (ny,)   exact spherical cell area [m2]
    area_u: jax.Array     # (ny,)   u-cell area (== area: lat-only dependence) [m2]
    area_v: jax.Array     # (ny,)   v-cell area at south faces, row 0 = wall [m2]
    corf: jax.Array       # (ny,)   Coriolis parameter at centers/u-rows [s-1]
    corf_v: jax.Array     # (ny,)   Coriolis at v rows (south faces) [s-1]
    tan_lat: jax.Array    # (ny,)   tan(lat) at centers (spherical metric term)
    tan_lat_v: jax.Array  # (ny,)   tan(lat) at v rows
    sigma_vb: jax.Array   # (nz+1,) sigma at level borders, 0..1
    sigma: jax.Array      # (nz,)   sigma at level centers
    dsigma: jax.Array     # (nz,)   border-to-border sigma thickness
    dt: jax.Array         # ()      fixed model timestep [s]
    # Per-latitude horizontal-diffusion coefficients [m2 s-1] (reference
    # UVFLX_dif_coef / POTT_hor_dif_tau analogues). Arrays rather than
    # scalars so (a) the fused kernel reads them from its geo operand —
    # retuning never recompiles — and (b) latitude-dependent scaling is a
    # grid-level choice. Currently constant = NumericsConfig.diff_*.
    kdiff_uv: jax.Array    # (ny,)
    kdiff_pott: jax.Array  # (ny,)
    kdiff_moist: jax.Array # (ny,)

    # metadata (static, hashable)
    nx: int = dataclasses.field(metadata=dict(static=True))
    ny: int = dataclasses.field(metadata=dict(static=True))
    nz: int = dataclasses.field(metadata=dict(static=True))
    ptop: float = dataclasses.field(metadata=dict(static=True))


def adaptive_cfl_dt(min_dx: float, cfl: float, max_wind: float) -> float:
    """dt from the CFL bound at the current max wind (reference solver.py
    ``dt = CFL * min(dx) / wind-speed scale``, SURVEY.md §3.1 hot loop #0):
    external-gravity-wave speed sqrt(g*H) plus the advective margin. The
    margin never drops below the 100 m/s used at init: the init dt sits
    close to the Matsuno/C-grid stability boundary, and relaxing the
    margin to a calm measured wind was MEASURED to blow up (1 deg full
    physics, dt = 1.27x init: NaN at day 0.57 — docs/STATUS.md round-3
    stability notes). With ``NumericsConfig.adaptive_dt`` the driver
    re-evaluates this per scan chunk, so dt only SHRINKS when winds exceed
    100 m/s — a blow-up safety net, which is the role the reference's
    per-step dt recompute plays."""
    c_grav = float(np.sqrt(c.G * 10_000.0))
    return float(cfl) * float(min_dx) / (c_grav + max(float(max_wind), 100.0))


def make_grid(cfg: GridConfig, num: NumericsConfig | None = None,
              dtype=jnp.float32, np_mode: bool = False) -> Grid:
    """Build the grid geometry.

    With ``np_mode=True`` returns float64 NumPy arrays (for the oracle);
    otherwise JAX arrays at ``dtype``.
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    lat0 = np.deg2rad(cfg.lat0_deg)
    lat1 = np.deg2rad(cfg.lat1_deg)
    lon0 = np.deg2rad(cfg.lon0_deg)
    lon1 = np.deg2rad(cfg.lon1_deg)

    dlat = (lat1 - lat0) / ny
    dlon = (lon1 - lon0) / nx

    faces = lat0 + dlat * np.arange(ny + 1)         # all faces (v rows + walls)
    lats = faces[:-1]                               # south faces (v rows)
    lat = 0.5 * (faces[:-1] + faces[1:])            # centers
    lonu = lon0 + dlon * np.arange(nx)              # u faces (west faces)
    lon = lonu + 0.5 * dlon                         # centers

    dy = c.R_EARTH * dlat
    dx = c.R_EARTH * dlon * np.cos(lat)
    dxs = c.R_EARTH * dlon * np.cos(lats)   # at stored (south) v rows

    # Exact spherical areas: A = rE^2 * dlon * (sin(lat_n) - sin(lat_s))
    area = c.R_EARTH**2 * dlon * (np.sin(faces[1:]) - np.sin(faces[:-1]))
    area_u = area.copy()
    # v cell spans center row j-1 .. center row j; row 0 is the wall (unused,
    # set to the adjacent area to avoid divide-by-zero).
    area_v = np.empty(ny)
    area_v[1:] = c.R_EARTH**2 * dlon * (np.sin(lat[1:]) - np.sin(lat[:-1]))
    area_v[0] = area[0]

    corf = 2.0 * c.OMEGA * np.sin(lat)
    corf_v = 2.0 * c.OMEGA * np.sin(lats)
    tan_lat = np.tan(lat)
    tan_lat_v = np.tan(lats)

    # Sigma borders (reference grid.py sigma arrays [C], first-class per
    # SURVEY.md §2.1 row 3): uniform for sigma_stretch == 1, else a power-law
    # stretch that thins layers toward the model top (exponent > 1).
    x = np.linspace(0.0, 1.0, nz + 1)
    sigma_vb = x ** float(getattr(cfg, "sigma_stretch", 1.0))
    sigma = 0.5 * (sigma_vb[:-1] + sigma_vb[1:])
    dsigma = np.diff(sigma_vb)

    num = num or NumericsConfig()
    ones_y = np.ones(ny)
    kdiff_uv = num.diff_uv * ones_y
    kdiff_pott = num.diff_pott * ones_y
    kdiff_moist = num.diff_moist * ones_y

    # Fixed dt from the external-gravity-wave CFL bound (SURVEY.md §3.1
    # rebuild note: no per-step host-synchronizing dt reduction).
    if num.dt is not None:
        dt = float(num.dt)
    else:
        dt = adaptive_cfl_dt(float(min(dx.min(), dy)), num.cfl, 100.0)

    arrays = dict(
        lat=lat, lats=lats, lon=lon, lonu=lonu, dx=dx, dxs=dxs,
        dy=np.asarray(dy), area=area, area_u=area_u, area_v=area_v,
        corf=corf, corf_v=corf_v, tan_lat=tan_lat, tan_lat_v=tan_lat_v,
        sigma_vb=sigma_vb, sigma=sigma, dsigma=dsigma, dt=np.asarray(dt),
        kdiff_uv=kdiff_uv, kdiff_pott=kdiff_pott, kdiff_moist=kdiff_moist,
    )
    if np_mode:
        arrays = {k: np.asarray(v, np.float64) for k, v in arrays.items()}
    else:
        arrays = {k: jnp.asarray(v, dtype) for k, v in arrays.items()}
    return Grid(nx=nx, ny=ny, nz=nz, ptop=cfg.ptop, **arrays)
