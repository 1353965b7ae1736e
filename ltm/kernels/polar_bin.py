"""Polar-context (Scan Context) descriptor binning kernel.

The descriptor is a (num_ring, num_sector) grid of per-bin **maximum z**
(+ lidar height), matching ``SCManager::makeScancontext``
(``ltslam/src/Scancontext.cpp:151-195``) including its exact ceil-and-clamp
bin rule and "empty bin -> 0" convention.  On TPU the per-point loop becomes
one scatter-max.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["make_descriptor", "make_descriptors"]

_NO_POINT = -1000.0


@partial(jax.jit, static_argnames=("num_ring", "num_sector"))
def make_descriptor(
    xyz: jax.Array,             # (N, 3) in the lidar frame
    mask: jax.Array,            # (N,)
    num_ring: int = 20,
    num_sector: int = 60,
    max_radius: float = 80.0,
    lidar_height: float = 2.0,
) -> jax.Array:
    x, y = xyz[..., 0], xyz[..., 1]
    z = xyz[..., 2] + lidar_height
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0  # xy2theta (Scancontext.cpp:23-36)

    valid = mask & (r <= max_radius)
    ring = jnp.clip(jnp.ceil(r / max_radius * num_ring), 1, num_ring).astype(jnp.int32) - 1
    sector = jnp.clip(jnp.ceil(theta / 360.0 * num_sector), 1, num_sector).astype(jnp.int32) - 1
    idx = ring * num_sector + sector

    zval = jnp.where(valid, z, -jnp.inf)
    desc = jnp.full((num_ring * num_sector,), _NO_POINT, xyz.dtype)
    desc = desc.at[idx].max(zval, mode="drop")
    desc = jnp.where(desc == _NO_POINT, 0.0, desc)
    return desc.reshape(num_ring, num_sector)


def make_descriptors(xyz: jax.Array, mask: jax.Array, **kw) -> jax.Array:
    """vmapped over a (K, N, 3) stack of scans -> (K, R, S)."""
    return jax.vmap(lambda p, m: make_descriptor(p, m, **kw))(xyz, mask)
