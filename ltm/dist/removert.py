"""Keyframe/chunk-sharded variants of the removert hot-path kernels.

These wire the production ``Removerter`` driver onto a device mesh (the
reference parallelizes the same loops with OpenMP by default,
``ltremovert/src/Session.cpp:408,491``; here the unit of parallelism is a
chip).  Each wrapper shards the embarrassingly parallel axis — keyframes
for the visibility/discrepancy sweeps, Morton chunks for the kNN — and
reduces with a single collective (``psum`` as logical OR), leaving the
result bit-identical to the single-device kernel (same per-keyframe work,
same OR combination; only the reduction order differs, and OR is exact).

Keyframe padding to a device-count multiple uses FAR poses (translation
1e9): the block selectors' range gate then selects zero blocks, so padded
keyframes contribute nothing — cheaper and simpler than threading validity
flags through every kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ltm.dist.mesh import KF_AXIS
from ltm.kernels.blocks import (
    BlockMap,
    block_fused_visibility_images,
    block_projected_scan_images,
    block_sweep_discrepancy,
    block_sweep_discrepancy_vs_images,
    block_sweep_visibility,
)
from ltm.kernels.projection import (
    NO_POINT,
    apply_pose,
    discrepancy_vs_image,
    packed_winner_image,
    projected_scan_images,
    winner_mask,
)

__all__ = [
    "block_sweep_discrepancy_sharded",
    "block_sweep_visibility_sharded",
    "block_projected_scan_images_sharded",
    "block_fused_visibility_images_sharded",
    "block_sweep_discrepancy_vs_images_sharded",
    "sweep_visibility_sharded",
    "projected_scan_images_sharded",
    "fused_visibility_images_sharded",
    "sweep_discrepancy_vs_images_sharded",
    "chunk_knn_sqdists_sharded",
]

_FAR = 1.0e9


def _pad_poses_far(pose_inv: jax.Array, poses: jax.Array, multiple: int):
    """Pad keyframe pose stacks with a viewpoint 1e9 m away: every
    range-gated block selection then comes back empty for padded entries."""
    K = poses.shape[0]
    pad = (-K) % multiple
    if pad == 0:
        return pose_inv, poses, K
    far = jnp.eye(4, dtype=poses.dtype).at[:3, 3].set(jnp.float32(_FAR))
    far_inv = jnp.eye(4, dtype=poses.dtype).at[:3, 3].set(jnp.float32(-_FAR))
    poses_p = jnp.concatenate([poses, jnp.broadcast_to(far, (pad, 4, 4))])
    pinv_p = jnp.concatenate([pose_inv, jnp.broadcast_to(far_inv, (pad, 4, 4))])
    return pinv_p, poses_p, K


def _pad_kf_axis(arr: jax.Array, multiple: int, fill=0):
    pad = (-arr.shape[0]) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[0] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)


def _bm_specs(sharded: bool = False):
    return BlockMap(P(), P(), P(), P(), P(), P(), P())


def block_sweep_discrepancy_sharded(
    mesh: Mesh, bm: BlockMap,
    scans_xyz, scans_mask, pose_inv, poses,
    fov, shape, k_blocks: int, max_range: float,
    diff_threshold: float = 0.1, reverse: bool = False,
):
    """Keyframe-sharded :func:`ltm.kernels.blocks.block_sweep_discrepancy`."""
    n_dev = mesh.devices.size
    pinv, po, _ = _pad_poses_far(pose_inv, poses, n_dev)
    sx = _pad_kf_axis(scans_xyz, n_dev)
    sm = _pad_kf_axis(scans_mask, n_dev, fill=False)

    def local(bm_l, sx_, sm_, pi_, po_):
        out = block_sweep_discrepancy(
            bm_l, sx_, sm_, pi_, po_, fov, shape, k_blocks=k_blocks,
            max_range=max_range, diff_threshold=diff_threshold, reverse=reverse)
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_bm_specs(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(), check_vma=False,
    )
    return fn(bm, sx, sm, pinv, po)


def block_sweep_visibility_sharded(
    mesh: Mesh, bm: BlockMap, extra_mask,
    pose_inv, poses, fov, shape, k_blocks: int, max_range: float,
):
    """Keyframe-sharded :func:`ltm.kernels.blocks.block_sweep_visibility`."""
    n_dev = mesh.devices.size
    pinv, po, _ = _pad_poses_far(pose_inv, poses, n_dev)

    def local(bm_l, em, pi_, po_):
        out = block_sweep_visibility(
            bm_l, em, pi_, po_, fov, shape, k_blocks=k_blocks, max_range=max_range)
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_bm_specs(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(), check_vma=False,
    )
    return fn(bm, extra_mask, pinv, po)


def block_projected_scan_images_sharded(
    mesh: Mesh, source_bm: BlockMap, source_extra,
    pose_inv, poses, fov, shape, proj_shape, k_blocks: int, max_range: float,
):
    """Keyframe-sharded :func:`block_projected_scan_images`; output stays
    sharded along keyframes (each device keeps the images of its keyframes,
    which is exactly what the vs-images sweep consumes)."""
    n_dev = mesh.devices.size
    K = poses.shape[0]
    pinv, po, _ = _pad_poses_far(pose_inv, poses, n_dev)

    def local(bm_l, se, pi_, po_):
        return block_projected_scan_images(
            bm_l, se, pi_, po_, fov, shape, proj_shape,
            k_blocks=k_blocks, max_range=max_range)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_bm_specs(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(KF_AXIS), check_vma=False,
    )
    return fn(source_bm, source_extra, pinv, po)[:K]


def block_fused_visibility_images_sharded(
    mesh: Mesh, source_bm: BlockMap, source_extra,
    pose_inv, poses, fov, shape, proj_shape, k_blocks: int, max_range: float,
    scale: float,
):
    """Keyframe-sharded :func:`block_fused_visibility_images`: the winner
    union psum-ORs across devices; the images stay keyframe-sharded (what
    the vs-images sweep consumes)."""
    n_dev = mesh.devices.size
    K = poses.shape[0]
    pinv, po, _ = _pad_poses_far(pose_inv, poses, n_dev)

    def local(bm_l, se, pi_, po_):
        win, imgs = block_fused_visibility_images(
            bm_l, se, pi_, po_, fov, shape, proj_shape,
            k_blocks=k_blocks, max_range=max_range, scale=scale)
        return jax.lax.psum(win.astype(jnp.int32), KF_AXIS) > 0, imgs

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_bm_specs(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=(P(), P(KF_AXIS)), check_vma=False,
    )
    win, imgs = fn(source_bm, source_extra, pinv, po)
    return win, imgs[:K]


def block_sweep_discrepancy_vs_images_sharded(
    mesh: Mesh, target_bm: BlockMap, target_extra,
    scan_imgs, pose_inv, poses, fov, shape, k_blocks: int, max_range: float,
    diff_threshold: float = 0.1, reverse: bool = False,
):
    """Keyframe-sharded :func:`block_sweep_discrepancy_vs_images` (padded
    keyframes carry NO_POINT images and far poses — zero contribution)."""
    n_dev = mesh.devices.size
    pinv, po, _ = _pad_poses_far(pose_inv, poses, n_dev)
    imgs = _pad_kf_axis(scan_imgs, n_dev, fill=NO_POINT)

    def local(bm_l, te, im, pi_, po_):
        out = block_sweep_discrepancy_vs_images(
            bm_l, te, im, pi_, po_, fov, shape, k_blocks=k_blocks,
            max_range=max_range, diff_threshold=diff_threshold, reverse=reverse)
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_bm_specs(), P(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(), check_vma=False,
    )
    return fn(target_bm, target_extra, imgs, pinv, po)


# ---------------------------------------------------------------------------
# flat (whole-map) variants — padded keyframes carry explicit validity flags
# because an identity/far pose still projects the whole map somewhere
# ---------------------------------------------------------------------------

def sweep_visibility_sharded(mesh: Mesh, map_xyz, map_mask, pose_inv, fov, shape):
    """Keyframe-sharded :func:`ltm.kernels.projection.sweep_visibility`."""
    n_dev = mesh.devices.size
    K = pose_inv.shape[0]
    pinv = _pad_kf_axis(pose_inv, n_dev)
    kfv = _pad_kf_axis(jnp.ones((K,), bool), n_dev, fill=False)

    def local(mx, mm, pi_, kv):
        def body(carry, inp):
            Tinv, v = inp
            loc = apply_pose(mx, Tinv)
            win, *_ = winner_mask(loc, mm, fov, shape)
            return carry | (win & v), None

        init = jax.lax.pcast(jnp.zeros(mx.shape[:-1], bool), KF_AXIS, to="varying")
        out, _ = jax.lax.scan(body, init, (pi_, kv))
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(), check_vma=False,
    )
    return fn(map_xyz, map_mask, pinv, kfv)


def projected_scan_images_sharded(mesh: Mesh, source_xyz, source_mask,
                                  pose_inv, fov, shape, proj_shape):
    """Keyframe-sharded :func:`projected_scan_images` (padded keyframes'
    images are sliced off)."""
    n_dev = mesh.devices.size
    K = pose_inv.shape[0]
    pinv = _pad_kf_axis(pose_inv, n_dev)

    def local(sx, sm, pi_):
        return projected_scan_images(sx, sm, pi_, fov, shape, proj_shape)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS)),
        out_specs=P(KF_AXIS), check_vma=False,
    )
    return fn(source_xyz, source_mask, pinv)[:K]


def fused_visibility_images_sharded(
    mesh: Mesh, source_xyz, source_mask, pose_inv, fov, shape, proj_shape,
    scale: float,
):
    """Keyframe-sharded :func:`ltm.kernels.projection.fused_visibility_images`
    (flat-map variant; padded keyframes carry validity flags)."""
    n_dev = mesh.devices.size
    K = pose_inv.shape[0]
    pinv = _pad_kf_axis(pose_inv, n_dev)
    kfv = _pad_kf_axis(jnp.ones((K,), bool), n_dev, fill=False)

    def local(sx, sm, pi_, kv):
        def body(carry, inp):
            Tinv, v = inp
            loc = apply_pose(sx, Tinv)
            win, img = packed_winner_image(loc, sm, fov, proj_shape, shape, scale)
            return carry | (win & v), jnp.where(v, img, NO_POINT)

        init = jax.lax.pcast(jnp.zeros(sx.shape[:-1], bool), KF_AXIS, to="varying")
        win, imgs = jax.lax.scan(body, init, (pi_, kv))
        return jax.lax.psum(win.astype(jnp.int32), KF_AXIS) > 0, imgs

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=(P(), P(KF_AXIS)), check_vma=False,
    )
    win, imgs = fn(source_xyz, source_mask, pinv, kfv)
    return win, imgs[:K]


def sweep_discrepancy_vs_images_sharded(
    mesh: Mesh, target_xyz, target_mask, scan_imgs, pose_inv,
    fov, shape, diff_threshold: float = 0.1, reverse: bool = False,
):
    """Keyframe-sharded :func:`sweep_discrepancy_vs_images`."""
    n_dev = mesh.devices.size
    K = pose_inv.shape[0]
    pinv = _pad_kf_axis(pose_inv, n_dev)
    imgs = _pad_kf_axis(scan_imgs, n_dev, fill=NO_POINT)
    kfv = _pad_kf_axis(jnp.ones((K,), bool), n_dev, fill=False)

    def local(tx, tm, im, pi_, kv):
        def body(carry, inp):
            img, Tinv, v = inp
            loc = apply_pose(tx, Tinv)
            dyn = discrepancy_vs_image(loc, tm, img, fov, shape, diff_threshold, reverse)
            return carry | (dyn & v), None

        init = jax.lax.pcast(jnp.zeros(tx.shape[:-1], bool), KF_AXIS, to="varying")
        out, _ = jax.lax.scan(body, init, (im, pi_, kv))
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(), check_vma=False,
    )
    return fn(target_xyz, target_mask, imgs, pinv, kfv)


# ---------------------------------------------------------------------------
# chunk-sharded kNN
# ---------------------------------------------------------------------------

def chunk_knn_sqdists_sharded(
    mesh: Mesh, query_xyz, query_mask, bm: BlockMap, target_extra,
    clamp_radius: float, k: int = 2, chunk: int = 512,
    k_blocks: int = 64, sort_cell: float = 25.0,
):
    """Chunk-sharded :func:`ltm.kernels.chunk_knn.chunk_knn_sqdists`: the
    Morton sort and block bounds replicate (cheap), the per-chunk
    gather+score scan — the dominant cost — splits across devices along the
    chunk axis with no collective (pure concatenation).  Identical results
    including per-chunk overflow reporting, so the driver's escalation /
    brute-force fallback logic is unchanged."""
    from ltm.kernels.chunk_knn import (
        ChunkKnnResult,
        _BIG,
        _block_bounds,
        _prep_sorted_chunks,
        _scan_chunks,
    )

    n = query_xyz.shape[0]
    n_dev = mesh.devices.size
    t_mask, bval, blo, bhi = _block_bounds(bm, target_extra)
    qx, qm, order = _prep_sorted_chunks(query_xyz, query_mask, chunk, sort_cell)
    C = qx.shape[0]
    qx = _pad_kf_axis(qx, n_dev)                 # padded chunks are all-invalid
    qm = _pad_kf_axis(qm, n_dev, fill=False)     # -> the lax.cond empty branch

    def local(qx_, qm_, bx, tm, bv, lo, hi):
        return _scan_chunks(qx_, qm_, bx, tm, bv, lo, hi, clamp_radius, k, k_blocks)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(KF_AXIS), P(KF_AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(KF_AXIS), P(KF_AXIS)), check_vma=False,
    )
    chunk_overflow, d = fn(qx, qm, bm.xyz, t_mask, bval, blo, bhi)
    res = jnp.full((n, k), _BIG, jnp.float32).at[order].set(
        d.reshape(-1, k)[:n])
    return ChunkKnnResult(res, chunk_overflow[:C], order.astype(jnp.int32))
