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

import contextlib
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class _ShardCtx:
    """Active shard-local mode (set by dist/halo.py inside shard_map)."""

    lat_axis: Optional[str] = None   # mesh axis name for latitude, or None
    lon_axis: Optional[str] = None
    n_lat: int = 1                   # mesh extent along each axis
    n_lon: int = 1
    # Trace-time dedup of halo collectives: the same field is shifted the
    # same way several times inside one tendency evaluation; caching by
    # tracer identity emits each edge ppermute once (keys keep strong refs
    # so ids stay unique for the cache's lifetime).
    cache: Optional[dict] = None


_CTX = _ShardCtx()


@contextlib.contextmanager
def shard_mode(lat_axis: Optional[str], lon_axis: Optional[str],
               n_lat: int, n_lon: int):
    """Switch the shift primitives to shard-local semantics: each shift
    fetches its one-cell halo from the mesh-neighbor shard via
    ``jax.lax.ppermute`` (periodic ring in lon; open chain in lat, with the
    wall behavior realized by ppermute's zero-fill on chain ends / by edge
    substitution for clamped shifts). Tracing-time only (thread-unsafe by
    design: jax traces a shard_map body once, single-threaded)."""
    global _CTX
    prev = _CTX
    _CTX = _ShardCtx(lat_axis=lat_axis if n_lat > 1 else None,
                     lon_axis=lon_axis if n_lon > 1 else None,
                     n_lat=n_lat, n_lon=n_lon, cache={})
    try:
        yield
    finally:
        _CTX = prev


def _cached(op_name, a, build):
    cache = _CTX.cache
    if cache is None:
        return build()
    key = (op_name, id(a))
    if key not in cache:
        cache[key] = (a, build())   # keep `a` alive so id() stays unique
    return cache[key][1]


def _ring_perm(n, shift):
    return [(i, (i + shift) % n) for i in range(n)]


def _pp(x, axis, perm):
    """ppermute with an optimization barrier on the operand: XLA:CPU
    miscompiles collective-permute when the operand is a fused pad+slice
    (observed reading uninitialized memory at some shard widths); the
    barrier forces materialization of the tiny edge slice first."""
    return jax.lax.ppermute(jax.lax.optimization_barrier(x), axis, perm)


def west(a):
    """Value of the west (i-1) neighbor; periodic wrap at the lon seam."""
    if _CTX.lon_axis is None:
        return jnp.roll(a, 1, axis=-1)

    def build():
        recv = _pp(a[..., -1:], _CTX.lon_axis, _ring_perm(_CTX.n_lon, +1))
        return jnp.concatenate([recv, a[..., :-1]], axis=-1)

    return _cached("west", a, build)


def east(a):
    """Value of the east (i+1) neighbor; periodic wrap at the lon seam."""
    if _CTX.lon_axis is None:
        return jnp.roll(a, -1, axis=-1)

    def build():
        recv = _pp(a[..., :1], _CTX.lon_axis, _ring_perm(_CTX.n_lon, -1))
        return jnp.concatenate([a[..., 1:], recv], axis=-1)

    return _cached("east", a, build)


def _from_south(a):
    """Southernmost row of the south-neighbor shard (zeros on shard 0 —
    ppermute zero-fills destinations with no source)."""
    perm = [(i, i + 1) for i in range(_CTX.n_lat - 1)]
    return _pp(a[..., -1:, :], _CTX.lat_axis, perm)


def _from_north(a):
    perm = [(i, i - 1) for i in range(1, _CTX.n_lat)]
    return _pp(a[..., :1, :], _CTX.lat_axis, perm)


def south_zero(a):
    """Value of the south (j-1) neighbor; zero beyond the south wall.

    (Implemented with concatenate rather than jnp.pad: XLA:CPU miscompiles a
    collective-permute whose operand is derived from a pad op — observed
    uninitialized-memory reads when these shifts compose under shard_map.)"""
    if _CTX.lat_axis is None:
        return jnp.concatenate(
            [jnp.zeros_like(a[..., :1, :]), a[..., :-1, :]], axis=-2)
    def build():
        recv = _from_south(a)        # zeros on the southernmost shard
        return jnp.concatenate([recv, a[..., :-1, :]], axis=-2)

    return _cached("south_zero", a, build)


def north_zero(a):
    """Value of the north (j+1) neighbor; zero beyond the north wall."""
    if _CTX.lat_axis is None:
        return jnp.concatenate(
            [a[..., 1:, :], jnp.zeros_like(a[..., -1:, :])], axis=-2)
    def build():
        recv = _from_north(a)        # zeros on the northernmost shard
        return jnp.concatenate([a[..., 1:, :], recv], axis=-2)

    return _cached("north_zero", a, build)


def south_clamp(a):
    """South neighbor with edge replication (zero-gradient wall)."""
    if _CTX.lat_axis is None:
        return jnp.concatenate([a[..., :1, :], a[..., :-1, :]], axis=-2)
    def build():
        recv = _from_south(a)
        idx = jax.lax.axis_index(_CTX.lat_axis)
        row = jnp.where(idx == 0, a[..., :1, :], recv)
        return jnp.concatenate([row, a[..., :-1, :]], axis=-2)

    return _cached("south_clamp", a, build)


def north_clamp(a):
    """North neighbor with edge replication (zero-gradient wall)."""
    if _CTX.lat_axis is None:
        return jnp.concatenate([a[..., 1:, :], a[..., -1:, :]], axis=-2)
    def build():
        recv = _from_north(a)
        idx = jax.lax.axis_index(_CTX.lat_axis)
        row = jnp.where(idx == _CTX.n_lat - 1, a[..., -1:, :], recv)
        return jnp.concatenate([a[..., 1:, :], row], axis=-2)

    return _cached("north_clamp", a, build)


def enforce_v_walls(v):
    """Zero the stored south-wall row of v (row ny, the north wall, is not
    stored — see core/grid.py convention). Under sharding, only the
    southernmost lat-shard holds the wall row."""
    if _CTX.lat_axis is None:
        return v.at[..., 0, :].set(0.0)
    idx = jax.lax.axis_index(_CTX.lat_axis)
    row0 = jnp.where(idx == 0, jnp.zeros_like(v[..., 0, :]), v[..., 0, :])
    return v.at[..., 0, :].set(row0)
