"""Device mesh construction for 2-D lat-lon domain decomposition.

TPU-native replacement for the reference's (absent) distributed layer
(SURVEY.md §2.2: the reference is single-process; BASELINE.json requires a
2-D lat-lon shard grid over a TPU mesh with halo exchange over ICI and
multi-host over DCN).

Axis names: ``('lat', 'lon')``. Longitude is the innermost mesh axis so the
periodic lon ring maps onto ICI ring neighbors.
"""

from __future__ import annotations

import jax
import numpy as np

from ..core.config import ModelConfig

LAT, LON = "lat", "lon"


def make_mesh(cfg: ModelConfig = None, mesh_lat: int = None,
              mesh_lon: int = None, devices=None) -> jax.sharding.Mesh:
    """Build a (mesh_lat, mesh_lon) mesh. With no arguments, uses all local
    devices on a 1 x N lon ring (halo traffic is cheapest along lon: the
    periodic seam is a natural ring)."""
    if cfg is not None:
        mesh_lat = mesh_lat or cfg.sharding.mesh_lat
        mesh_lon = mesh_lon or cfg.sharding.mesh_lon
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_lat is None:
        mesh_lat, mesh_lon = 1, n
    if mesh_lat * mesh_lon > n:
        raise ValueError(
            f"mesh {mesh_lat}x{mesh_lon} needs {mesh_lat*mesh_lon} devices, "
            f"have {n}")
    devs = np.asarray(devices[: mesh_lat * mesh_lon]).reshape(
        mesh_lat, mesh_lon)
    return jax.sharding.Mesh(devs, (LAT, LON))


def validate_divisibility(cfg: ModelConfig, mesh: jax.sharding.Mesh):
    gc = cfg.grid
    mlat, mlon = mesh.shape[LAT], mesh.shape[LON]
    if gc.ny % mlat or gc.nx % mlon:
        raise ValueError(
            f"grid {gc.ny}x{gc.nx} not divisible by mesh {mlat}x{mlon}")
