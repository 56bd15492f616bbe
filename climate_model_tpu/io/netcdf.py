"""NetCDF output writer.

TPU-native rebuild of the reference ``IO.py`` / ``output_to_NC`` (SURVEY.md
§2.1 [C]: periodic ``out_XXXX.nc`` files with dims (time, level, lat, lon)
and fields UWIND, VWIND, WWIND, PSURF, POTT, TAIR, PHI, QV, QC, RAIN, plus a
constants file with HSURF and the land mask).

The environment has no netCDF4/xarray; files are written as NetCDF-3 classic
via ``scipy.io.netcdf_file`` (same on-disk format family the reference's
netCDF4 writer produced, readable by any NetCDF tool). Multi-host note
(SURVEY.md §3.5): callers gather shards to host 0 first
(``jax.experimental.multihost_utils.process_allgather``) or write per-shard
files; this writer is host-local.
"""

from __future__ import annotations

import os

import numpy as np

from ..core import constants as c
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import operators as ops


def host_global(tree):
    """Make every array in ``tree`` fully addressable on every host.

    Multi-host runs hold globally-sharded jax.Arrays whose remote shards
    ``np.asarray`` cannot fetch; gather them over DCN first
    (SURVEY.md §3.5: ``process_allgather`` -> host-0 writer). Single-process
    (incl. multi-device single-host) arrays pass through unchanged."""
    import jax
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def write_constants_nc(path: str, grid: Grid, forcing: Forcing):
    """Constants file: grid coordinates, HSURF, land mask, albedo."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as f:
        ny, nx = forcing.hsurf.shape
        f.createDimension("lat", ny)
        f.createDimension("lon", nx)
        f.createDimension("level", grid.nz)
        f.createDimension("levels", grid.nz + 1)
        for name, dims, data in (
            ("lat", ("lat",), np.rad2deg(np.asarray(grid.lat))),
            ("lon", ("lon",), np.rad2deg(np.asarray(grid.lon))),
            ("sigma", ("level",), np.asarray(grid.sigma)),
            ("sigma_vb", ("levels",), np.asarray(grid.sigma_vb)),
            ("HSURF", ("lat", "lon"), np.asarray(forcing.hsurf)),
            ("LAND_MASK", ("lat", "lon"), np.asarray(forcing.land_mask)),
            ("ALBEDO", ("lat", "lon"), np.asarray(forcing.albedo)),
        ):
            v = f.createVariable(name, "f", dims)
            v[:] = np.asarray(data, np.float32)


def write_output_nc(path: str, state: State, grid: Grid, forcing: Forcing):
    """One output snapshot (reference wrote out_XXXX.nc per interval)."""
    from scipy.io import netcdf_file

    diag = ops.diagnose(state.colp, state.pott, forcing.hsurf, grid)
    cont = ops.continuity(state.u, state.v, state.colp, state.colp,
                          grid.dt, grid)
    fields3 = dict(
        UWIND=state.u, VWIND=state.v, POTT=state.pott, TAIR=diag.tair,
        PHI=diag.phi, QV=state.qv, QC=state.qc,
    )
    fields2 = dict(
        PSURF=grid.ptop + state.colp, COLP=state.colp, RAIN=state.rain,
        TSURF=state.tsurf, SOILMOIST=state.soil_moist,
    )
    with netcdf_file(path, "w") as f:
        nz, ny, nx = state.u.shape
        f.createDimension("time", 1)
        f.createDimension("level", nz)
        f.createDimension("levels", nz + 1)
        f.createDimension("lat", ny)
        f.createDimension("lon", nx)
        tv = f.createVariable("time", "f", ("time",))
        tv[:] = np.asarray([float(state.t) / 86400.0], np.float32)
        tv.units = b"days since start"
        for name, vals in (("lat", np.rad2deg(np.asarray(grid.lat))),
                           ("lon", np.rad2deg(np.asarray(grid.lon)))):
            cv = f.createVariable(name, "f", (name,))
            cv[:] = np.asarray(vals, np.float32)
            cv.units = b"degrees"
        for name, arr in fields3.items():
            v = f.createVariable(name, "f", ("time", "level", "lat", "lon"))
            v[:] = np.asarray(arr, np.float32)[None]
        wv = f.createVariable("WWIND", "f", ("time", "levels", "lat", "lon"))
        wv[:] = np.asarray(cont.wwind, np.float32)[None]
        for name, arr in fields2.items():
            v = f.createVariable(name, "f", ("time", "lat", "lon"))
            v[:] = np.asarray(arr, np.float32)[None]


class NCWriter:
    """Sequenced output files out_0000.nc, out_0001.nc, ... plus a one-time
    constants.nc (reference IO.py layout)."""

    def __init__(self, out_dir: str):
        import glob
        import re

        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        # Resume continues the sequence instead of overwriting the earlier
        # timeline (constants.nc is only written when the sequence starts).
        existing = [int(m.group(1))
                    for f in glob.glob(os.path.join(out_dir, "out_*.nc"))
                    if (m := re.search(r"out_(\d+)\.nc$", f))]
        self.count = max(existing) + 1 if existing else 0

    def write(self, state: State, grid: Grid, forcing: Forcing):
        import jax
        if jax.process_count() > 1:
            # gather on every host (the allgather is a collective all
            # processes must join), write on host 0 only
            state, grid, forcing = host_global((state, grid, forcing))
            if jax.process_index() != 0:
                self.count += 1
                return None
        if self.count == 0:
            write_constants_nc(os.path.join(self.out_dir, "constants.nc"),
                               grid, forcing)
        path = os.path.join(self.out_dir, f"out_{self.count:04d}.nc")
        write_output_nc(path, state, grid, forcing)
        self.count += 1
        return path
