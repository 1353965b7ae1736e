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
           "voxel_downsample_representative_capped",
           "voxel_downsample_centroid_capped", "voxel_unique_mask"]

_INT_SENTINEL = 2**31 - 1  # plain int: no backend init at import (pod workers)

# out-of-envelope detection for the packed sort keys below (advisor r4):
# the 21/19/21-bit per-axis clamp silently splits/merges groups at the
# boundary voxel for surveys beyond ~210/52/210 km at 0.1 m voxels.  With
# LTM_VOXEL_CLAMP_CHECK=1 every voxel kernel checks its rebased coords
# against the limits on device and warns ONCE via host callback (default
# off: the check is a branch decided at trace time, zero cost when unset).
_CLAMP_CHECK = __import__("os").environ.get("LTM_VOXEL_CLAMP_CHECK", "0") == "1"
_clamp_warned = False


def _warn_if_clamped(sat) -> None:  # host-side jax.debug.callback target
    global _clamp_warned
    if bool(sat) and not _clamp_warned:
        _clamp_warned = True
        import logging

        logging.getLogger("ltm.kernels.voxel").warning(
            "voxel sort-key clamp hit: survey extent exceeds the 21/19/21-bit "
            "per-axis envelope — groups at the boundary voxel may split/merge "
            "(shrink the extent or raise the voxel size)")


def voxel_coords(xyz: jax.Array, voxel: float) -> jax.Array:
    """(N, 3) float -> (N, 3) int32 voxel coordinates."""
    return jnp.floor(xyz / voxel).astype(jnp.int32)


def _sorted_groups(coords: jax.Array, mask: jax.Array):
    """Sort points by voxel (invalid last); return order + group segment ids.

    The (invalid, x, y, z) lexsort is packed into TWO int32 keys — a 4-key
    lexsort is 4 stable sort passes and measured 2x the whole-kernel cost on
    v5e (34 ms per 835k-row ICP submap union).  Coordinates rebase to the
    valid minimum and clamp at 21/19/21 bits per axis (2M/0.5M/2M voxels —
    210/52 km at 0.1 m voxels, far beyond any survey map); beyond that,
    clamped outliers can split or merge groups at the boundary voxel (the
    previous raw-coord sort had no such bound, but no pipeline input
    approaches it — group identity is otherwise bit-identical)."""
    c = jnp.where(mask[:, None], coords, _INT_SENTINEL)
    cmin = jnp.min(jnp.where(mask[:, None], coords, _INT_SENTINEL), axis=0)
    cr = jnp.clip(coords - cmin, 0, None)
    x = jnp.minimum(cr[:, 0], (1 << 21) - 1)
    y = jnp.minimum(cr[:, 1], (1 << 19) - 1)
    z = jnp.minimum(cr[:, 2], (1 << 21) - 1)
    if _CLAMP_CHECK:
        lim = jnp.asarray([(1 << 21) - 1, (1 << 19) - 1, (1 << 21) - 1])
        sat = jnp.any(jnp.where(mask[:, None], cr, 0) > lim[None, :])
        jax.debug.callback(_warn_if_clamped, sat)
    # 61-bit [x:21|y:19|z:21] split as hi=[invalid:1|x:21|y_hi:9],
    # lo=[y_lo:10|z:21] — both non-negative int32
    key_hi = (jnp.where(mask, 0, jnp.int32(1 << 30))
              | (x << 9) | (y >> 10))
    key_lo = ((y & ((1 << 10) - 1)) << 21) | z
    # (measured: a variadic lax.sort with num_keys=2 is NOT faster than the
    # two lexsort passes on TPU — 1.95 vs 1.86 ms per 418k rows)
    order = jnp.lexsort((key_lo, key_hi))
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


@partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample_representative_capped(xyz: jax.Array, mask: jax.Array,
                                           voxel: float, out_capacity: int):
    """Representative downsample with a spatially UNIFORM overflow cap.

    Keeps REAL input points (one representative per voxel — no centroid
    blur), and when more than ``out_capacity`` voxels are occupied, merges
    adjacent voxels (in sorted-key order) uniformly — ``seg ->
    floor(seg*cap/nvox)`` like :func:`voxel_downsample_centroid_capped` —
    keeping the first sorted point of each merged group.  Under capacity
    the kept SET is exactly :func:`voxel_downsample_representative`'s
    (first point per voxel), emitted in voxel-sorted order.

    This is the fixed-shape submap filter for ICP (see
    ``slam.session.assemble_submap``): the centroid variant measured WORSE
    there (overflow merges average 2+ adjacent-voxel points into phantom
    mid-points; on the slam bench ICP medians went 5 -> 15 iterations and
    ATE 0.053 -> 0.129 m), while an order-biased truncation covers only a
    spatial prefix of the submap.  Cost: one key-sort + one segment_min +
    one gather (the plain representative path pays three full sorts).
    """
    n = xyz.shape[0]
    order, seg, ms, is_new = _sorted_groups(voxel_coords(xyz, voxel), mask)
    xs = xyz[order]
    num_voxels = jnp.sum(is_new.astype(jnp.int32))
    nv = jnp.maximum(num_voxels, 1)
    # same uniform-merge slot rule as centroid_capped (f32 ratio: seg*cap
    # overflows int32 without x64 mode; all points of a voxel share seg)
    ratio = jnp.float32(out_capacity) / nv.astype(jnp.float32)
    slot = jnp.floor(seg.astype(jnp.float32) * ratio).astype(jnp.int32)
    slot = jnp.minimum(slot, out_capacity - 1)
    seg_u = jnp.where(num_voxels > out_capacity, slot, seg)
    seg_u = jnp.minimum(jnp.where(ms, seg_u, out_capacity), out_capacity)
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jax.ops.segment_min(jnp.where(ms, idx, n), seg_u,
                                num_segments=out_capacity + 1)
    out_mask = first[:out_capacity] < n
    out_xyz = xs[jnp.clip(first[:out_capacity], 0, n - 1)]
    return out_xyz, out_mask, num_voxels
