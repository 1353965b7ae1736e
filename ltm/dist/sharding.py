"""Keyframe-sharded kernels via shard_map + collectives.

Each wrapper shards the embarrassingly parallel axis across the mesh and
reduces with one collective:

  * ``sweep_discrepancy_sharded``  — keyframes split across devices, map
    replicated; per-device OR masks combined with a ``psum`` (logical OR);
  * ``knn_avg_sqdist_sharded``     — queries split, target map replicated;
    pure concatenation along the sharded axis (no collective needed);
  * ``sc_distance_sharded``        — Scan Context query rows split.

These mirror the reference's OpenMP loops (``ltremovert/src/Session.cpp:
408,491``, ``ltslam/src/LTslam.cpp:389,534``) at chip scale.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ltm.dist.mesh import KF_AXIS, pad_to_multiple
from ltm.kernels.knn import knn_avg_sqdist
from ltm.kernels.projection import apply_pose, discrepancy_mask
from ltm.retrieval.scancontext import sc_distance_matrix

__all__ = ["sweep_discrepancy_sharded", "sweep_discrepancy_map_sharded", "knn_avg_sqdist_sharded", "sc_distance_sharded", "icp_batch_sharded"]


def sweep_discrepancy_sharded(
    mesh: Mesh,
    map_xyz: jax.Array, map_mask: jax.Array,
    scans_xyz: jax.Array, scans_mask: jax.Array, pose_inv: jax.Array,
    fov: Tuple[float, float], shape: Tuple[int, int],
    diff_threshold: float = 0.1, reverse: bool = False,
) -> jax.Array:
    """OR over keyframes of the visibility discrepancy, keyframes sharded."""
    n_dev = mesh.devices.size
    scans_xyz = pad_to_multiple(scans_xyz, n_dev)
    scans_mask = pad_to_multiple(scans_mask, n_dev)
    pose_inv = pad_to_multiple(pose_inv, n_dev)
    # padded keyframes: identity pose + empty masks contribute nothing

    def local(mx, mm, sx, sm, pi):
        def body(carry, inp):
            s_xyz, s_mask, Tinv = inp
            loc = apply_pose(mx, Tinv)
            dyn = discrepancy_mask(loc, mm, s_xyz, s_mask, fov, shape, diff_threshold, reverse)
            return carry | dyn, None

        init = jax.lax.pcast(jnp.zeros(mx.shape[:-1], bool), KF_AXIS, to="varying")
        out, _ = jax.lax.scan(body, init, (sx, sm, pi))
        # logical OR across devices
        return jax.lax.psum(out.astype(jnp.int32), KF_AXIS) > 0

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(map_xyz, map_mask, scans_xyz, scans_mask, pose_inv)


def sweep_discrepancy_map_sharded(
    mesh: Mesh,
    map_xyz: jax.Array, map_mask: jax.Array,
    scans_xyz: jax.Array, scans_mask: jax.Array, pose_inv: jax.Array,
    fov: Tuple[float, float], shape: Tuple[int, int],
    diff_threshold: float = 0.1, reverse: bool = False,
) -> jax.Array:
    """Visibility sweep with the MAP sharded across devices (for maps larger
    than one chip's HBM); keyframes replicated.

    Each device scatter-mins its map shard into a partial range image; a
    ``pmin`` collective over the mesh merges partials into the global image
    (one 450 KB all-reduce per keyframe riding ICI), and the winner/flag test
    runs shard-locally.  Exactly equals the single-device sweep.
    """
    from ltm.kernels.projection import VALID_DIFF_UB, _project_min, range_image

    n_dev = mesh.devices.size
    n = map_xyz.shape[0]
    mx = pad_to_multiple(map_xyz, n_dev)
    mm = pad_to_multiple(map_mask, n_dev)

    def local(mx_, mm_, sx, sm, pi):
        def body(carry, inp):
            s_xyz, s_mask, Tinv = inp
            local_pts = apply_pose(mx_, Tinv)
            scan_img = range_image(s_xyz, s_mask, fov, shape)
            pix, rng, part = _project_min(local_pts, mm_, fov, shape)
            map_img = jax.lax.pmin(part, KF_AXIS)          # global per-pixel min
            diff_img = (map_img - scan_img) if reverse else (scan_img - map_img)
            flag_img = (diff_img > diff_threshold) & (diff_img < VALID_DIFF_UB)
            packed = jnp.where(flag_img, map_img, -map_img)
            g = packed[pix]
            win = mm_ & (rng <= jnp.abs(g))
            return carry | (win & (g > 0)), None

        init = jax.lax.pcast(jnp.zeros(mx_.shape[:-1], bool), KF_AXIS, to="varying")
        out, _ = jax.lax.scan(body, init, (sx, sm, pi))
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(KF_AXIS), P(KF_AXIS), P(), P(), P()),
        out_specs=P(KF_AXIS),
        check_vma=False,
    )
    return fn(mx, mm, scans_xyz, scans_mask, pose_inv)[:n]


def knn_avg_sqdist_sharded(
    mesh: Mesh,
    query_xyz: jax.Array, query_mask: jax.Array,
    target_xyz: jax.Array, target_mask: jax.Array,
    k: int = 2, tile: int = 8192,
) -> jax.Array:
    """Queries sharded across devices, target replicated."""
    n = query_xyz.shape[0]
    n_dev = mesh.devices.size
    qx = pad_to_multiple(query_xyz, n_dev)
    qm = pad_to_multiple(query_mask, n_dev)

    def local(qx_, qm_, tx, tm):
        return knn_avg_sqdist(qx_, qm_, tx, tm, k=k, tile=tile)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(KF_AXIS), P(KF_AXIS), P(), P()),
        out_specs=P(KF_AXIS),
        check_vma=False,
    )
    return fn(qx, qm, target_xyz, target_mask)[:n]


def sc_distance_sharded(
    mesh: Mesh,
    query_descs: jax.Array, target_descs: jax.Array,
    full_shift_search: bool = True, search_ratio: float = 0.1,
):
    """All-pairs SC distance with query rows sharded."""
    q = query_descs.shape[0]
    n_dev = mesh.devices.size
    qd = pad_to_multiple(query_descs, n_dev)

    def local(qd_, td):
        return sc_distance_matrix(qd_, td, full_shift_search=full_shift_search,
                                  search_ratio=search_ratio)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(KF_AXIS), P()),
        out_specs=(P(KF_AXIS), P(KF_AXIS)),
        check_vma=False,
    )
    dist, shift = fn(qd, target_descs)
    return dist[:q], shift[:q]


def icp_batch_sharded(mesh: Mesh, src_xyz, src_mask, tgt_xyz, tgt_mask,
                      init_transforms=None, **kw):
    """ICP candidate batch sharded across devices (the reference's OpenMP ICP
    farm, ``ltslam/src/LTslam.cpp:389``, at chip scale).  Each device runs its
    vmapped shard with an independent early-exit loop."""
    import jax.numpy as jnp

    from ltm.register.icp import icp_batch

    n_dev = mesh.devices.size
    b = src_xyz.shape[0]
    if init_transforms is None:
        init_transforms = jnp.broadcast_to(jnp.eye(4, dtype=src_xyz.dtype), (b, 4, 4))
    pad = (-b) % n_dev
    if pad:
        rep = lambda a: jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
        src_xyz, src_mask = rep(src_xyz), rep(src_mask)
        tgt_xyz, tgt_mask = rep(tgt_xyz), rep(tgt_mask)
        init_transforms = rep(init_transforms)

    def local(s, sm, t, tm, T0):
        return tuple(icp_batch(s, sm, t, tm, T0, **kw))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=(P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        check_vma=False,
    )
    T, conv, fit, iters, crit = fn(src_xyz, src_mask, tgt_xyz, tgt_mask, init_transforms)
    from ltm.register.icp import ICPResult

    return ICPResult(T[:b], conv[:b], fit[:b], iters[:b], crit[:b])
