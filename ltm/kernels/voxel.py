"""Voxel-grid operations on padded clouds (fixed shapes, jit-safe).

Replaces PCL's ``OctreePointCloudVoxelCentroid`` (reference
``octreeDownsampling``, ``ltremovert/src/utility.cpp:204-219``) and
``VoxelGrid`` with a sort + segment-reduce formulation:

  1. integer voxel coordinates per point;
  2. lexicographic sort (keeps everything in 32-bit — no 64-bit voxel keys);
  3. group boundaries -> segment ids;
  4. segment mean (centroid) or first-representative select.

Outputs stay padded: the result has a fixed capacity and a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["voxel_coords", "voxel_downsample_centroid",
           "voxel_downsample_centroid_capped", "voxel_unique_mask"]

_INT_SENTINEL = 2**31 - 1  # plain int: no backend init at import (pod workers)


def voxel_coords(xyz: jax.Array, voxel: float) -> jax.Array:
    """(N, 3) float -> (N, 3) int32 voxel coordinates."""
    return jnp.floor(xyz / voxel).astype(jnp.int32)


def _sorted_groups(coords: jax.Array, mask: jax.Array):
    """Sort points by voxel (invalid last); return order + group segment ids."""
    c = jnp.where(mask[:, None], coords, _INT_SENTINEL)
    # lexsort: last key is primary
    order = jnp.lexsort((c[:, 2], c[:, 1], c[:, 0], (~mask).astype(jnp.int32)))
    cs = c[order]
    ms = mask[order]
    prev = jnp.roll(cs, 1, axis=0)
    is_new = jnp.any(cs != prev, axis=-1)
    is_new = is_new.at[0].set(True)
    is_new = is_new & ms
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # invalid tail inherits last id; masked out later
    return order, seg, ms, is_new


@partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample_centroid(xyz: jax.Array, mask: jax.Array, voxel: float, out_capacity: int):
    """Centroid-per-voxel downsample.

    Returns ``(out_xyz (C,3), out_mask (C,), num_voxels)``; voxels beyond
    ``out_capacity`` are dropped (check ``num_voxels`` to detect overflow).
    """
    order, seg, ms, is_new = _sorted_groups(voxel_coords(xyz, voxel), mask)
    xs = xyz[order]
    w = ms.astype(xyz.dtype)
    seg_clipped = jnp.where(ms, seg, out_capacity)  # invalid -> dropped bucket
    seg_clipped = jnp.minimum(seg_clipped, out_capacity)
    sums = jax.ops.segment_sum(xs * w[:, None], seg_clipped, num_segments=out_capacity + 1)
    counts = jax.ops.segment_sum(w, seg_clipped, num_segments=out_capacity + 1)
    num_voxels = jnp.sum(is_new.astype(jnp.int32))
    out_xyz = sums[:out_capacity] / jnp.maximum(counts[:out_capacity, None], 1.0)
    out_mask = counts[:out_capacity] > 0
    return out_xyz, out_mask, num_voxels


@partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample_centroid_capped(xyz: jax.Array, mask: jax.Array, voxel: float,
                                     out_capacity: int):
    """Centroid downsample with graceful overflow: when more than
    ``out_capacity`` voxels are occupied, adjacent voxels (in lexicographic
    order) are merged uniformly — ``seg -> seg*cap//nvox`` — so the output
    is a spatially uniform density cap instead of a truncated tail.

    This is the load-time per-scan downsample (``loadKeyframes`` VoxelGrid,
    reference ``ltremovert/src/Session.cpp:283-289``) for scans denser than
    the scan capacity; vmapped over a whole session's keyframes it replaces
    the host-side per-scan loop with one batched device program.
    """
    order, seg, ms, is_new = _sorted_groups(voxel_coords(xyz, voxel), mask)
    xs = xyz[order]
    w = ms.astype(xyz.dtype)
    num_voxels = jnp.sum(is_new.astype(jnp.int32))
    nv = jnp.maximum(num_voxels, 1)
    # slot = floor(seg * cap / nv) in f32 (seg*cap overflows int32 without
    # x64 mode; all points of a voxel share seg, so rounding stays per-voxel
    # deterministic and only nudges merge boundaries)
    ratio = jnp.float32(out_capacity) / nv.astype(jnp.float32)
    slot = jnp.floor(seg.astype(jnp.float32) * ratio).astype(jnp.int32)
    slot = jnp.minimum(slot, out_capacity - 1)
    seg_u = jnp.where(num_voxels > out_capacity, slot, seg)
    seg_u = jnp.minimum(jnp.where(ms, seg_u, out_capacity), out_capacity)
    sums = jax.ops.segment_sum(xs * w[:, None], seg_u, num_segments=out_capacity + 1)
    counts = jax.ops.segment_sum(w, seg_u, num_segments=out_capacity + 1)
    out_xyz = sums[:out_capacity] / jnp.maximum(counts[:out_capacity, None], 1.0)
    out_mask = counts[:out_capacity] > 0
    return out_xyz, out_mask, num_voxels


@jax.jit
def voxel_unique_mask(xyz: jax.Array, mask: jax.Array, voxel: float) -> jax.Array:
    """Keep-one-representative-per-voxel mask (preserves point identity).

    Used where the pipeline only needs dedupe semantics and downstream
    stages still index the original points (e.g. masking a global map after
    a union composition).  The kept point is the first in voxel-sorted
    order — deterministic.
    """
    order, seg, ms, is_new = _sorted_groups(voxel_coords(xyz, voxel), mask)
    keep_sorted = is_new
    inv = jnp.argsort(order)
    return keep_sorted[inv] & mask


@partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample_representative(xyz: jax.Array, mask: jax.Array, voxel: float, out_capacity: int):
    """First-point-per-voxel downsample into a fixed-capacity output."""
    keep = voxel_unique_mask(xyz, mask, voxel)
    # compact kept points to the front
    order = jnp.argsort(~keep, stable=True)
    out_xyz = xyz[order][:out_capacity]
    out_mask = keep[order][:out_capacity]
    return out_xyz, out_mask, jnp.sum(keep.astype(jnp.int32))
