"""Block-structured global maps: the locality layer of the hot path.

Dynamic-index ops (scatter/gather) serialize on the TPU scalar unit at ~6
cycles/element, so the visibility sweep costs ~14 ns per *map point* per
keyframe no matter how it is phrased.  The winning lever is to touch fewer
points per keyframe, under a per-call range bound chosen so culling is
exact.  For the forward diff (``scan − map``), a flagged map point must
satisfy ``range < scan_pixel_range − thres ≤ max_scan_range``, and a culled
farther point can neither be flagged nor displace a pixel *minimum* below
the bound — so ``max_range = max_scan_range + thres`` reproduces the
whole-map sweep bit-for-bit.  For the reversed diff the analogous exact
bound is ``source_range_bound + kValidDiffUpperBound`` (see
``ltm.removert.pipeline``).  ``required_k_blocks`` sizes the static block
budget so no in-range block is ever truncated.

So the map is laid out once as fixed-size spatial blocks (coarse voxels,
points grouped contiguously).  Per keyframe, the nearest ``k_blocks`` blocks
are gathered at *block granularity* — contiguous DMA, not per-element
gather — and only that working set is scattered/projected.  Results come
back to the blocked layout with a block-granular scatter.  The same layout
is the unit of multi-chip map sharding (SURVEY §2.3 "map-block sharding").

Trade-off: ``k_blocks`` is a static shape; keyframes near map edges process
padding (masked).  For maps much larger than the sensor range this is a
large net win (the reference reprojects the *whole* map per keyframe,
``ltremovert/src/Removerter.cpp:452,508,565``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

import numpy as np

from ltm.kernels.projection import apply_pose, discrepancy_mask, winner_mask

__all__ = ["BlockMap", "build_block_map", "build_block_map_with_slots",
           "required_k_blocks",
           "block_sweep_discrepancy", "block_sweep_visibility",
           "block_fused_visibility_images",
           "block_sweep_discrepancy_vs_images_presel",
           "block_fused_phase_a", "block_fused_phase_b"]


class BlockMap(NamedTuple):
    """Blocked global map (all arrays fixed-shape)."""

    xyz: jax.Array          # (n_blocks, block_capacity, 3)
    mask: jax.Array         # (n_blocks, block_capacity)
    centers: jax.Array      # (n_blocks, 3) — mean of member points
    radius: jax.Array       # (n_blocks,) — max member distance from center
    block_valid: jax.Array  # (n_blocks,)
    bmin: jax.Array         # (n_blocks, 3) — member AABB (occlusion culling:
    bmax: jax.Array         # LiDAR surface blocks are flat, so the AABB's
                            # angular footprint is far tighter than the ball's)

    @property
    def num_blocks(self) -> int:
        return self.xyz.shape[0]

    @property
    def block_capacity(self) -> int:
        return self.xyz.shape[1]

    def flat_xyz(self) -> jax.Array:
        return self.xyz.reshape(-1, 3)

    def flat_mask(self) -> jax.Array:
        return self.mask.reshape(-1)


@partial(jax.jit, static_argnames=("n_blocks", "block_capacity"))
def build_block_map_with_slots(
    xyz: jax.Array,          # (N, 3)
    mask: jax.Array,         # (N,)
    cell_size: float,
    n_blocks: int,
    block_capacity: int,
):
    """Group points into spatially compact, fully packed blocks (one-time
    sort by coarse-voxel + sub-cell Morton keys, amortized over every
    keyframe sweep).  Returns (BlockMap, overflow_count, slots) —
    overflow_count > 0 means capacity was insufficient and points were
    dropped (callers should size n_blocks * block_capacity >= N); slots
    maps each input index to its flat position in the blocked layout.
    """
    n = xyz.shape[0]
    coords = jnp.floor(xyz / cell_size).astype(jnp.int32)

    # secondary key: Morton code of the 8x8x8 sub-cell position, so the
    # capacity-sized blocks a cell spills into are spatially COMPACT runs
    # instead of arbitrary point subsets — tighter bounding balls mean finer
    # range culling (~10% smaller sweep working sets, measured).  With dense
    # packing below, blocks MAY span cell boundaries — exactness relies only
    # on each block's measured center/radius/AABB, never on the cell grid
    sub = jnp.clip(jnp.floor(xyz * (8.0 / cell_size)).astype(jnp.int32) - coords * 8, 0, 7)

    def _spread3(v):  # 3 bits -> every 3rd bit
        return (v & 1) | ((v & 2) << 2) | ((v & 4) << 4)

    morton = (_spread3(sub[:, 0]) << 2) | (_spread3(sub[:, 1]) << 1) | _spread3(sub[:, 2])
    # sort by (invalid, cx, cy, cz, morton) packed into TWO int32 keys — a
    # naive 5-key lexsort is 5 stable sorts and measured ~2 s per 1M-point
    # build on v5e (the dominant session-prep cost); two keys halve+ it.
    # Cell coords rebase to the valid minimum and clamp at 15/16 bits
    # (32768/65536 cells per axis — 819 km at 25 m cells); clamped far
    # outliers may share a block across cells, which only loosens that
    # block's bounding ball (exactness arguments use the actual
    # centers/radius, never the cell grid).
    cmin = jnp.min(jnp.where(mask[:, None], coords, jnp.int32(2**30)), axis=0)
    cr = jnp.clip(coords - cmin, 0, (1 << 16) - 1)
    key_hi = (jnp.where(mask, 0, jnp.int32(1 << 30))
              | (jnp.minimum(cr[:, 0], (1 << 15) - 1) << 15)
              | jnp.minimum(cr[:, 1], (1 << 15) - 1))
    key_lo = (cr[:, 2] << 9) | morton
    order = jnp.lexsort((key_lo, key_hi))
    ms = mask[order]
    xs = xyz[order]

    # dense packing: valid points stream into fully packed capacity-sized
    # runs of the Morton-sorted order.  Blocks MAY span cell boundaries —
    # every exactness argument downstream (required_k_blocks, per-sweep
    # range bounds, chunk-kNN candidate selection, occlusion footprints)
    # uses only the blocks' measured centers/radius/AABB, never the cell
    # grid — and 100% occupancy cuts every block sweep's working set by the
    # old cell-aligned layout's padding share (~26% measured on the e2e
    # corridor maps).  Cell+sub-cell Morton keys still provide the spatial
    # locality that keeps bounding volumes tight.
    rank = jnp.cumsum(ms.astype(jnp.int32)) - ms.astype(jnp.int32)
    block_id = rank // block_capacity
    slot = rank % block_capacity

    valid = ms & (block_id < n_blocks)
    overflow = jnp.sum((ms & ~(block_id < n_blocks)).astype(jnp.int32))

    flat_idx = jnp.where(valid, block_id * block_capacity + slot, n_blocks * block_capacity)
    out_xyz = jnp.zeros((n_blocks * block_capacity + 1, 3), xyz.dtype)
    out_xyz = out_xyz.at[flat_idx].set(xs, mode="drop")
    out_mask = jnp.zeros((n_blocks * block_capacity + 1,), bool)
    out_mask = out_mask.at[flat_idx].set(valid, mode="drop")
    bxyz = out_xyz[:-1].reshape(n_blocks, block_capacity, 3)
    bmask = out_mask[:-1].reshape(n_blocks, block_capacity)

    cnt = jnp.sum(bmask, axis=1)
    centers = jnp.sum(jnp.where(bmask[..., None], bxyz, 0.0), axis=1) / jnp.maximum(cnt, 1)[:, None]
    d = jnp.linalg.norm(bxyz - centers[:, None, :], axis=-1)
    radius = jnp.max(jnp.where(bmask, d, 0.0), axis=1)
    big = jnp.asarray(3e38, bxyz.dtype)
    bmin = jnp.min(jnp.where(bmask[..., None], bxyz, big), axis=1)
    bmax = jnp.max(jnp.where(bmask[..., None], bxyz, -big), axis=1)
    empty = ~(cnt > 0)
    bmin = jnp.where(empty[:, None], 0.0, bmin)
    bmax = jnp.where(empty[:, None], 0.0, bmax)
    bm = BlockMap(bxyz, bmask, centers, radius, cnt > 0, bmin, bmax)
    # original-index -> flat block slot (n_blocks*cap sentinel for dropped /
    # invalid points): lets callers rebuild ONE block layout per map and
    # restrict the target subset per query via a boolean scatter (the
    # chunk-kNN target_extra contract) instead of re-blocking per subset
    slots = jnp.full((n,), n_blocks * block_capacity, jnp.int32)
    slots = slots.at[order].set(flat_idx.astype(jnp.int32))
    return bm, overflow, slots


@partial(jax.jit, static_argnames=("n_blocks", "block_capacity"))
def build_block_map(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size: float,
    n_blocks: int,
    block_capacity: int,
) -> Tuple[BlockMap, jax.Array]:
    """(BlockMap, overflow_count) — see ``build_block_map_with_slots``."""
    bm, overflow, _ = build_block_map_with_slots(xyz, mask, cell_size, n_blocks, block_capacity)
    return bm, overflow


def required_k_blocks(bm: BlockMap, origins: np.ndarray, max_range: float,
                      round_to: int = 128) -> int:
    """Smallest exact ``k_blocks`` for a set of viewpoints: the max over
    origins of the number of valid blocks whose bounding ball intersects the
    ``max_range`` ball (what ``_select_blocks`` must not truncate).  Host-side
    (NumPy); rounded up to a multiple of ``round_to`` to bound recompiles,
    clamped to the number of blocks.  Sweeps sized this way touch every block
    that could contribute, so the culled sweep equals the whole-map sweep
    whenever ``max_range`` itself is a sound bound (see the per-call notes in
    ``ltm.removert.pipeline``)."""
    return required_k_blocks_np(np.asarray(bm.centers), np.asarray(bm.radius),
                                np.asarray(bm.block_valid), origins, max_range,
                                round_to)


def required_k_blocks_np(centers: np.ndarray, radius: np.ndarray,
                         valid: np.ndarray, origins: np.ndarray,
                         max_range: float, round_to: int = 128) -> int:
    """``required_k_blocks`` on already-fetched host arrays — lets callers
    that interleave multiple sweeps batch the device fetch of
    (centers, radius, valid) with other pending host reads instead of
    paying a blocking ``np.asarray`` per layout (see
    ``Removerter._filter_strong_many``)."""
    origins = np.asarray(origins).reshape(-1, 3)
    d = np.linalg.norm(centers[None] - origins[:, None], axis=-1) - radius[None]
    need = int(((d <= max_range) & valid[None]).sum(axis=1).max(initial=0))
    need = ((need + round_to - 1) // round_to) * round_to
    return int(min(max(need, round_to), centers.shape[0]))


def _select_blocks(bm: BlockMap, origin: jax.Array, max_range: float, k_blocks: int):
    """Indices of the k nearest blocks that intersect the range ball."""
    d = jnp.linalg.norm(bm.centers - origin, axis=-1) - bm.radius
    d = jnp.where(bm.block_valid, d, jnp.inf)
    d = jnp.where(d <= max_range, d, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d, k_blocks)
    sel_valid = jnp.isfinite(-neg_top)
    return idx.astype(jnp.int32), sel_valid


@partial(jax.jit, static_argnames=("fov", "shape", "k_blocks", "reverse"))
def block_sweep_discrepancy(
    bm: BlockMap,
    scans_xyz: jax.Array,    # (K, S, 3)
    scans_mask: jax.Array,   # (K, S)
    pose_inv: jax.Array,     # (K, 4, 4)
    poses: jax.Array,        # (K, 4, 4) — for block selection origins
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    k_blocks: int,
    max_range: float = 200.0,
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """Block-local version of ``sweep_discrepancy``; returns the flat
    (n_blocks*block_capacity,) dynamic mask over the blocked layout."""

    def body(carry, inp):
        scan_xyz, scan_mask, Tinv, T = inp
        sel, sel_valid = _select_blocks(bm, T[:3, 3], max_range, k_blocks)
        work_xyz = bm.xyz[sel].reshape(-1, 3)                       # block-granular gather
        work_mask = (bm.mask[sel] & sel_valid[:, None]).reshape(-1)
        local = apply_pose(work_xyz, Tinv)
        dyn = discrepancy_mask(local, work_mask, scan_xyz, scan_mask,
                               fov, shape, diff_threshold, reverse)
        dyn_blocks = dyn.reshape(k_blocks, bm.block_capacity)
        carry = carry.at[sel].max(dyn_blocks)                        # block-granular scatter
        return carry, None

    init = jnp.zeros((bm.num_blocks, bm.block_capacity), bool)
    out, _ = jax.lax.scan(body, init, (scans_xyz, scans_mask, pose_inv, poses))
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "k_blocks", "reverse"))
def block_sweep_discrepancy_projected(
    target_bm: BlockMap,
    target_extra: jax.Array,     # flat mask restricting the target (delta) set
    source_bm: BlockMap,
    source_extra: jax.Array,     # flat mask restricting the source (static) set
    pose_inv: jax.Array,         # (K, 4, 4)
    poses: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    proj_shape: Tuple[int, int],
    k_blocks: int,
    max_range: float = 200.0,
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """Block-local ``sweep_discrepancy_projected`` (ND/PD strong-weak core)."""
    t_extra = target_extra.reshape(target_bm.num_blocks, target_bm.block_capacity)
    s_extra = source_extra.reshape(source_bm.num_blocks, source_bm.block_capacity)

    def body(carry, inp):
        Tinv, T = inp
        origin = T[:3, 3]
        tsel, tval = _select_blocks(target_bm, origin, max_range, k_blocks)
        ssel, sval = _select_blocks(source_bm, origin, max_range, k_blocks)
        t_xyz = target_bm.xyz[tsel].reshape(-1, 3)
        t_mask = (target_bm.mask[tsel] & t_extra[tsel] & tval[:, None]).reshape(-1)
        s_xyz = source_bm.xyz[ssel].reshape(-1, 3)
        s_mask = (source_bm.mask[ssel] & s_extra[ssel] & sval[:, None]).reshape(-1)
        t_local = apply_pose(t_xyz, Tinv)
        s_local = apply_pose(s_xyz, Tinv)
        swin, *_ = winner_mask(s_local, s_mask, fov, proj_shape)
        dyn = discrepancy_mask(t_local, t_mask, s_local, swin, fov, shape, diff_threshold, reverse)
        carry = carry.at[tsel].max(dyn.reshape(k_blocks, target_bm.block_capacity))
        return carry, None

    init = jnp.zeros((target_bm.num_blocks, target_bm.block_capacity), bool)
    out, _ = jax.lax.scan(body, init, (pose_inv, poses))
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "k_blocks"))
def block_projected_scan_images(
    source_bm: BlockMap,
    source_extra: jax.Array,     # flat mask restricting the source (static) set
    pose_inv: jax.Array,         # (K, 4, 4)
    poses: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    proj_shape: Tuple[int, int],
    k_blocks: int,
    max_range: float = 200.0,
) -> jax.Array:
    """Block-local ``projected_scan_images``: (K, nrow*ncol) range images of
    the projected static scans, identical block selection to
    ``block_sweep_discrepancy_projected`` so the cached-image filter path
    flags exactly the same points."""
    from ltm.kernels.projection import range_image

    s_extra = source_extra.reshape(source_bm.num_blocks, source_bm.block_capacity)

    def body(_, inp):
        Tinv, T = inp
        ssel, sval = _select_blocks(source_bm, T[:3, 3], max_range, k_blocks)
        s_xyz = source_bm.xyz[ssel].reshape(-1, 3)
        s_mask = (source_bm.mask[ssel] & s_extra[ssel] & sval[:, None]).reshape(-1)
        s_local = apply_pose(s_xyz, Tinv)
        swin, *_ = winner_mask(s_local, s_mask, fov, proj_shape)
        return None, range_image(s_local, swin, fov, shape)

    _, imgs = jax.lax.scan(body, None, (pose_inv, poses))
    return imgs


@partial(jax.jit, static_argnames=("fov", "shape", "k_blocks", "reverse"))
def block_sweep_discrepancy_vs_images(
    target_bm: BlockMap,
    target_extra: jax.Array,     # flat mask restricting the target (delta) set
    scan_imgs: jax.Array,        # (K, nrow*ncol) from block_projected_scan_images
    pose_inv: jax.Array,
    poses: jax.Array,
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    k_blocks: int,
    max_range: float = 200.0,
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """Target-side half of ``block_sweep_discrepancy_projected`` against
    precomputed source images (the per-repeat cost of the strong-weak
    filter).

    Selection restricts to blocks CONTAINING target (delta) points — exact
    (an empty block contributes nothing) and crucial when the delta set is
    a few car-sized clusters in a large map: callers can then size
    ``k_blocks`` by the delta's block count instead of the range ball."""
    from ltm.kernels.projection import discrepancy_vs_image

    t_extra = target_extra.reshape(target_bm.num_blocks, target_bm.block_capacity)
    occupied = target_bm.block_valid & jnp.any(target_bm.mask & t_extra, axis=1)
    sel_bm = target_bm._replace(block_valid=occupied)

    def body(carry, inp):
        Tinv, T, img = inp
        tsel, tval = _select_blocks(sel_bm, T[:3, 3], max_range, k_blocks)
        t_xyz = target_bm.xyz[tsel].reshape(-1, 3)
        t_mask = (target_bm.mask[tsel] & t_extra[tsel] & tval[:, None]).reshape(-1)
        t_local = apply_pose(t_xyz, Tinv)
        dyn = discrepancy_vs_image(
            t_local, t_mask, img, fov, shape, diff_threshold, reverse
        )
        carry = carry.at[tsel].max(dyn.reshape(k_blocks, target_bm.block_capacity))
        return carry, None

    init = jnp.zeros((target_bm.num_blocks, target_bm.block_capacity), bool)
    out, _ = jax.lax.scan(body, init, (pose_inv, poses, scan_imgs))
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("fov", "shape", "reverse"))
def block_sweep_discrepancy_vs_images_presel(
    target_bm: BlockMap,
    target_extra: jax.Array,     # flat mask restricting the target (delta) set
    scan_imgs: jax.Array,        # (K, nrow*ncol) source range images
    pose_inv: jax.Array,         # (K, 4, 4)
    sel_idx: jax.Array,          # (K, k_sel) int32 — per-keyframe block lists
    sel_valid: jax.Array,        # (K, k_sel)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """``block_sweep_discrepancy_vs_images`` with the per-keyframe block
    selection precomputed OUTSIDE (occlusion culling, ``ltm.kernels.occlusion``)
    instead of the in-body range-ball top-k.  Exactness is the caller's
    contract: every block that could flag a point for keyframe k must appear
    in ``sel_idx[k]`` (see the occlusion module's slack arguments).

    Also subsumes the forward HD sweep: pass ``scan_imgs`` built from the
    actual scans (one vmapped ``range_image``) instead of projected-static
    winner images."""
    from ltm.kernels.projection import discrepancy_vs_image

    t_extra = target_extra.reshape(target_bm.num_blocks, target_bm.block_capacity)

    def body(carry, inp):
        Tinv, img, tsel, tval = inp
        t_xyz = target_bm.xyz[tsel].reshape(-1, 3)
        t_mask = (target_bm.mask[tsel] & t_extra[tsel] & tval[:, None]).reshape(-1)
        t_local = apply_pose(t_xyz, Tinv)
        dyn = discrepancy_vs_image(
            t_local, t_mask, img, fov, shape, diff_threshold, reverse
        )
        carry = carry.at[tsel].max(dyn.reshape(-1, target_bm.block_capacity))
        return carry, None

    init = jnp.zeros((target_bm.num_blocks, target_bm.block_capacity), bool)
    out, _ = jax.lax.scan(body, init, (pose_inv, scan_imgs, sel_idx, sel_valid))
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "k_near", "scale"))
def block_fused_phase_a(
    source_bm: BlockMap,
    source_extra: jax.Array,     # flat mask restricting the source (static) set
    pose_inv: jax.Array,         # (K, 4, 4)
    poses: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],      # filter-resolution image (packed Δ bits)
    proj_shape: Tuple[int, int],
    k_near: int,
    r_near: float,
    scale: float,
):
    """Phase A of the occlusion-culled fused winner pass: per keyframe,
    scatter only the blocks within ``r_near`` into the packed proj-resolution
    image, then test every remaining block's footprint against the
    provisional image (hierarchical max pyramid).  Returns
    ``(sel_a (K,k_near), sel_a_valid, packed_imgs (K,n_pix_p), survive
    (K,n_blocks))`` — survivors are far blocks that might still win a pixel
    and must be scattered by phase B; culled blocks provably cannot win nor
    displace any pixel minimum (``ltm.kernels.occlusion`` docstring).
    ``k_near`` must be ``required_k_blocks(bm, origins, r_near)``-sized so no
    in-range block is truncated."""
    from ltm.kernels.occlusion import (
        block_rect_and_rmin,
        build_range_pyramid,
        footprint_max,
    )
    from ltm.kernels.projection import _PACKED_SENTINEL, _pack_points

    s_extra = source_extra.reshape(source_bm.num_blocks, source_bm.block_capacity)
    occupied = source_bm.block_valid & jnp.any(source_bm.mask & s_extra, axis=1)
    n_pix_p = proj_shape[0] * proj_shape[1]

    def body(_, inp):
        Tinv, T = inp
        origin = T[:3, 3]
        sel, sel_valid = _select_blocks(source_bm, origin, r_near, k_near)
        work_xyz = source_bm.xyz[sel].reshape(-1, 3)
        work_mask = (source_bm.mask[sel] & s_extra[sel] & sel_valid[:, None]).reshape(-1)
        local = apply_pose(work_xyz, Tinv)
        packed, pix_p = _pack_points(local, work_mask, fov, proj_shape, shape, scale)
        img_p = jnp.full((n_pix_p,), _PACKED_SENTINEL, jnp.int32)
        img_p = img_p.at[pix_p].min(packed, mode="drop")

        # provisional effective-range image: empty pixels are +inf (any
        # point would win there), else the winner's decoded range
        eff = jnp.where(img_p == _PACKED_SENTINEL, jnp.inf,
                        (img_p // 16).astype(jnp.float32) / scale)
        pyr = build_range_pyramid(eff, proj_shape)
        r0, r1, c0, width, r_min = block_rect_and_rmin(
            source_bm.bmin, source_bm.bmax, Tinv, fov, proj_shape)
        fmax = footprint_max(pyr, r0, r1, c0, width, proj_shape)
        near = (jnp.linalg.norm(source_bm.centers - origin, axis=-1)
                - source_bm.radius) <= r_near
        # 2/scale guards the fixed-point rounding of the decoded pixel range
        survive = occupied & ~near & (r_min <= fmax + 2.0 / scale)
        return None, (sel, sel_valid, img_p, survive)

    _, (sel_a, sel_a_valid, packed_imgs, survive) = jax.lax.scan(
        body, None, (pose_inv, poses))
    return sel_a, sel_a_valid, packed_imgs, survive


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "scale"))
def block_fused_phase_b(
    source_bm: BlockMap,
    source_extra: jax.Array,
    pose_inv: jax.Array,         # (K, 4, 4)
    packed_imgs: jax.Array,      # (K, n_pix_p) from phase A
    sel_b: jax.Array,            # (K, k_b) surviving far blocks
    sel_b_valid: jax.Array,
    sel_ab: jax.Array,           # (K, k_near + k_b) all processed blocks
    sel_ab_valid: jax.Array,
    fov: Tuple[float, float],
    shape: Tuple[int, int],      # filter-resolution image
    proj_shape: Tuple[int, int],
    scale: float,
):
    """Phase B: scatter the surviving far blocks into the provisional packed
    images, then winner-test ALL processed blocks (near + survivors) against
    the FINAL image and decode the filter-resolution winner images.  Returns
    ``(win_union_flat, (K, nrow*ncol) images)`` — bit-identical to the
    single-pass ``block_fused_visibility_images`` over the full range bound
    (culled blocks cannot win; phase-A win bits would be provisional, so the
    winner test runs here, after the image is final)."""
    from ltm.kernels.projection import (
        _PACKED_SENTINEL,
        _decode_winner_image,
        _pack_points,
    )

    s_extra = source_extra.reshape(source_bm.num_blocks, source_bm.block_capacity)

    def body(carry, inp):
        Tinv, img_p, bsel, bval, absel, abval = inp
        # far survivors: one more packed scatter-min into the provisional image
        b_xyz = source_bm.xyz[bsel].reshape(-1, 3)
        b_mask = (source_bm.mask[bsel] & s_extra[bsel] & bval[:, None]).reshape(-1)
        b_local = apply_pose(b_xyz, Tinv)
        b_packed, b_pix = _pack_points(b_local, b_mask, fov, proj_shape, shape, scale)
        img_p = img_p.at[b_pix].min(b_packed, mode="drop")

        # winner test of every processed block against the final image
        a_xyz = source_bm.xyz[absel].reshape(-1, 3)
        a_mask = (source_bm.mask[absel] & s_extra[absel] & abval[:, None]).reshape(-1)
        a_local = apply_pose(a_xyz, Tinv)
        a_packed, a_pix = _pack_points(a_local, a_mask, fov, proj_shape, shape, scale)
        win = a_mask & (a_packed == img_p[a_pix])
        carry = carry.at[absel].max(win.reshape(-1, source_bm.block_capacity))

        img_s = _decode_winner_image(img_p, proj_shape, shape, scale)
        return carry, img_s

    init = jnp.zeros((source_bm.num_blocks, source_bm.block_capacity), bool)
    out, imgs = jax.lax.scan(
        body, init, (pose_inv, packed_imgs, sel_b, sel_b_valid, sel_ab, sel_ab_valid))
    return out.reshape(-1), imgs


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "k_blocks", "scale"))
def block_fused_visibility_images(
    source_bm: BlockMap,
    source_extra: jax.Array,     # flat mask restricting the source (static) set
    pose_inv: jax.Array,         # (K, 4, 4)
    poses: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    proj_shape: Tuple[int, int],
    k_blocks: int,
    max_range: float,
    scale: float,
):
    """Block-local fused winner pass: per keyframe ONE packed scatter-min
    (``packed_winner_image``) yields both the winner (visibility) mask and
    the filter-resolution winner image — replacing the
    ``block_sweep_visibility`` + ``block_projected_scan_images`` pair over
    the same static set (5 dynamic-index ops/point → ~2).  Returns
    ``(win_union_flat, (K, nrow*ncol) images)``; block selection is
    identical to the pair it replaces, so flagged sets match."""
    from ltm.kernels.projection import packed_winner_image

    s_extra = source_extra.reshape(source_bm.num_blocks, source_bm.block_capacity)

    def body(carry, inp):
        Tinv, T = inp
        sel, sel_valid = _select_blocks(source_bm, T[:3, 3], max_range, k_blocks)
        work_xyz = source_bm.xyz[sel].reshape(-1, 3)
        work_mask = (source_bm.mask[sel] & s_extra[sel] & sel_valid[:, None]).reshape(-1)
        local = apply_pose(work_xyz, Tinv)
        win, img = packed_winner_image(local, work_mask, fov, proj_shape, shape, scale)
        carry = carry.at[sel].max(win.reshape(k_blocks, source_bm.block_capacity))
        return carry, img

    init = jnp.zeros((source_bm.num_blocks, source_bm.block_capacity), bool)
    out, imgs = jax.lax.scan(body, init, (pose_inv, poses))
    return out.reshape(-1), imgs


@partial(jax.jit, static_argnames=("fov", "shape", "k_blocks"))
def block_sweep_visibility(
    bm: BlockMap,
    extra_mask: jax.Array,   # (n_blocks*block_capacity,) restrict to subset
    pose_inv: jax.Array,
    poses: jax.Array,
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    k_blocks: int,
    max_range: float = 200.0,
) -> jax.Array:
    """Block-local version of ``sweep_visibility``."""
    emask = extra_mask.reshape(bm.num_blocks, bm.block_capacity)

    def body(carry, inp):
        Tinv, T = inp
        sel, sel_valid = _select_blocks(bm, T[:3, 3], max_range, k_blocks)
        work_xyz = bm.xyz[sel].reshape(-1, 3)
        work_mask = (bm.mask[sel] & emask[sel] & sel_valid[:, None]).reshape(-1)
        local = apply_pose(work_xyz, Tinv)
        win, *_ = winner_mask(local, work_mask, fov, shape)
        carry = carry.at[sel].max(win.reshape(k_blocks, bm.block_capacity))
        return carry, None

    init = jnp.zeros((bm.num_blocks, bm.block_capacity), bool)
    out, _ = jax.lax.scan(body, init, (pose_inv, poses))
    return out.reshape(-1)
