"""Boundary-condition shift primitives.

TPU-native rebuild of the reference's ``boundaries.py`` / ``exchange_BC``
(SURVEY.md §2.1 [C]: fills a 1-cell physical halo — periodic copy in
longitude, rigid walls near the poles). Design departure (SURVEY.md §7.1):
there is no allocated halo. Operators are written against these *global-array*
neighbor shifts; under ``jax.jit`` with sharded inputs, XLA's SPMD partitioner
lowers them to the halo-exchange collectives automatically, and the explicit
``shard_map``/ppermute path (dist/halo.py) provides the manually-overlapped
variant of the same semantics.

Axis convention: axis -1 = longitude (periodic), axis -2 = latitude (walls).
Shift naming is by the *source* of the data: ``west(a)[..., i] = a[..., i-1]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def west(a):
    """Value of the west (i-1) neighbor; periodic wrap at the lon seam."""
    return jnp.roll(a, 1, axis=-1)


def east(a):
    """Value of the east (i+1) neighbor; periodic wrap at the lon seam."""
    return jnp.roll(a, -1, axis=-1)


def south_zero(a):
    """Value of the south (j-1) neighbor; zero beyond the south wall."""
    pad = [(0, 0)] * (a.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(a, pad)[..., :-1, :]


def north_zero(a):
    """Value of the north (j+1) neighbor; zero beyond the north wall."""
    pad = [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)]
    return jnp.pad(a, pad)[..., 1:, :]


def south_clamp(a):
    """South neighbor with edge replication (zero-gradient wall)."""
    return jnp.concatenate([a[..., :1, :], a[..., :-1, :]], axis=-2)


def north_clamp(a):
    """North neighbor with edge replication (zero-gradient wall)."""
    return jnp.concatenate([a[..., 1:, :], a[..., -1:, :]], axis=-2)


def up(a):
    """Value from level k-1 (above); zero-padded at the model top. axis -3."""
    pad = [(0, 0)] * (a.ndim - 3) + [(1, 0), (0, 0), (0, 0)]
    return jnp.pad(a, pad)[:-1, ...] if a.ndim == 3 else jnp.pad(a, pad)[..., :-1, :, :]


def enforce_v_walls(v):
    """Zero the stored south-wall row of v (row ny, the north wall, is not
    stored — see core/grid.py convention)."""
    return v.at[..., 0, :].set(0.0)
