"""Removert session state (fixed-shape, mask-based).

Mirrors the reference ``ltremovert::Session`` (``ltremovert/src/Session.cpp``)
but with a fundamentally different data model: instead of ~25 dynamically
grown PCL clouds per session (``Session.h:39-91``), each session keeps ONE
padded global-map array plus boolean masks over it.  Every partitioning step
(static/dynamic, ND/PD, strong/weak) flips mask bits — data never moves,
shapes never change, everything stays jit-compiled.

Host-side keyframe parsing (range/gap/ROI) mirrors
``parseKeyframes``/``parseKeyframesInROI`` (``Session.cpp:138-263``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltm.core.config import RemovertConfig
from ltm.kernels.blocks import BlockMap, build_block_map
from ltm.utils import get_logger
from ltm.kernels.voxel import voxel_downsample_centroid, voxel_downsample_centroid_capped

__all__ = ["RemovertInput", "RemovertSession", "parse_keyframe_indices", "parse_keyframes_in_roi"]

log = get_logger("ltm.removert.session")


@dataclass
class RemovertInput:
    """Host-side raw session: local-frame scans + base poses."""

    scans: List[np.ndarray]          # each (M_i, >=3) float32, lidar frame
    poses: np.ndarray                # (N, 4, 4) float64
    names: Optional[List[str]] = None

    @classmethod
    def from_dirs(cls, scan_dir: str, pose_path: str) -> "RemovertInput":
        """Load a scan directory (.pcd, or KITTI .bin — the reference's
        ``isScanFileKITTIFormat`` path) + a KITTI pose file."""
        import os

        from ltm.io.pcd import read_kitti_bin, read_pcd
        from ltm.io.poses import read_kitti_poses

        from ltm.io.sessions import _file_index

        names = [n for n in os.listdir(scan_dir) if n.endswith((".pcd", ".bin"))]
        # numeric sort by leading index ('10.pcd' must follow '2.pcd'; pose
        # file lines are in scan-index order)
        try:
            names.sort(key=_file_index)
        except ValueError:
            names.sort()
        scans = [
            read_kitti_bin(os.path.join(scan_dir, n)) if n.endswith(".bin")
            else read_pcd(os.path.join(scan_dir, n))
            for n in names
        ]
        poses = read_kitti_poses(pose_path)
        if len(scans) != len(poses):
            raise ValueError(f"{len(scans)} scans vs {len(poses)} poses")
        return cls(scans=scans, poses=poses, names=names)


def parse_keyframe_indices(num: int, start: int, end: int, gap: int) -> np.ndarray:
    """``parseKeyframes({start,end}, gap)`` (``Session.cpp:138-174``)."""
    idx = np.arange(num)
    idx = idx[(idx >= start) & (idx <= end)]
    return idx[::max(gap, 1)]


def parse_keyframes_in_roi(poses: np.ndarray, roi_poses: np.ndarray, thres: float, gap: int) -> np.ndarray:
    """``parseKeyframesInROI`` (``Session.cpp:230-263``): keep scans within
    ``thres`` meters of any ROI (central keyframe) pose, then gap-subsample."""
    p = poses[:, :3, 3]
    r = roi_poses[:, :3, 3]
    d = np.linalg.norm(p[:, None] - r[None], axis=-1).min(axis=1)
    idx = np.flatnonzero(d <= thres)
    return idx[::max(gap, 1)]


def _preclean(scan: np.ndarray, radius: float, z_band: float) -> np.ndarray:
    """``precleaningKeyframes`` (``Session.cpp:506-533``): drop ego-ring
    points with range < radius and |z| < z_band."""
    xyz = scan[:, :3]
    r = np.linalg.norm(xyz, axis=1)
    drop = (r < radius) & (np.abs(xyz[:, 2]) < z_band)
    return scan[~drop]


def estimate_map_voxel_count(inp, cfg, keyframe_indices=None) -> int:
    """Host-side estimate of a session's merged-map voxel count (the number
    ``build``'s ``_merge_global`` reports) WITHOUT building the session:
    preclean + per-scan voxel downsample + global voxel cell count.  The
    lifelong driver uses it to lock ``map_capacity`` BEFORE round 1 so the
    whole chain compiles exactly one program set (the post-round-1 lock paid
    a second full compile set mid-chain — 591 s measured on the 6-session
    bench, PERF.md)."""
    v = cfg.downsample_voxel_size
    lidar2base = np.asarray(cfg.extrinsic_lidar_to_base, np.float64).reshape(4, 4)
    kf = range(len(inp.scans)) if keyframe_indices is None else keyframe_indices
    ids = []
    for i in kf:
        s = _preclean(np.asarray(inp.scans[i], np.float32),
                      cfg.preclean_radius, cfg.preclean_z_band)
        pts = _voxel_downsample_host(s[:, :3], v)
        T = np.asarray(inp.poses[i], np.float64) @ lidar2base
        g = pts @ T[:3, :3].T + T[:3, 3]
        ids.append(np.floor(g / v).astype(np.int64))
    if not ids:
        return 0
    return len(np.unique(np.concatenate(ids), axis=0))


def _voxel_downsample_host(xyz: np.ndarray, voxel: float) -> np.ndarray:
    """Per-scan load-time voxel downsample (``loadKeyframes`` VoxelGrid,
    ``Session.cpp:283-289``).  Native C++ grid when available, NumPy fallback
    (first-point-per-voxel; centroid in the native path)."""
    if voxel <= 0:
        return xyz
    from ltm.io import native

    if native.available():
        out = native.voxel_downsample_native(np.ascontiguousarray(xyz[:, :3]), voxel)
        if out is not None:
            return out
    keys = np.floor(xyz[:, :3] / voxel).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return xyz[np.sort(first), :3]


@partial(jax.jit, static_argnames=("out_capacity",))
def _prep_scans_device(raw_xyz, raw_mask, voxel, radius, z_band, out_capacity):
    """Batched load-time scan prep on device: ego-ring preclean
    (``precleaningKeyframes``, reference ``Session.cpp:506-533``) + per-scan
    voxel-centroid downsample (``loadKeyframes``, ``Session.cpp:283-289``) as
    ONE vmapped program over all keyframes — replaces a serial host loop that
    dominated the pipeline's prep stage on small-CPU hosts."""

    def one(xyz, mask):
        r2 = jnp.sum(xyz * xyz, axis=1)
        keep = mask & ~((r2 < radius * radius) & (jnp.abs(xyz[:, 2]) < z_band))
        return voxel_downsample_centroid_capped(xyz, keep, voxel, out_capacity)

    return jax.vmap(one)(raw_xyz, raw_mask)


@partial(jax.jit, static_argnames=("capacity",))
def _merge_global(scans_xyz, scans_mask, poses, voxel, capacity):
    """Merge keyframes into the global frame + centroid downsample
    (``mergeScansWithinGlobalCoord`` + ``octreeDownsampling``,
    ``Session.cpp:186-202``, ``utility.cpp:204-219``)."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    moved = jnp.einsum("kij,ksj->ksi", R, scans_xyz, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    flat = moved.reshape(-1, 3)
    fmask = scans_mask.reshape(-1)
    return voxel_downsample_centroid(flat, fmask, voxel, capacity)


@dataclass
class RemovertSession:
    """Device-resident session state."""

    sess_type: str                   # "Central" | "Query"
    num_keyframes: int
    keyframe_indices: np.ndarray     # into the original scan list
    names: List[str]
    poses: jax.Array                 # (K_cap, 4, 4) f32 — effective (base∘lidar2base)
    poses_inv: jax.Array             # (K_cap, 4, 4)
    kf_valid: jax.Array              # (K_cap,)
    scans_xyz: jax.Array             # (K_cap, S, 3) lidar frame
    scans_mask: jax.Array            # (K_cap, S)

    map_xyz: jax.Array               # (N, 3) global frame
    map_mask: jax.Array              # (N,) valid map points
    masks: Dict[str, jax.Array] = field(default_factory=dict)  # named partitions
    bm: Optional[BlockMap] = None    # block layout of the same points (fast path)
    max_scan_range: float = 0.0      # max sensor range over all valid returns
                                     # (sets the exact forward-sweep bound)

    @classmethod
    def build(cls, inp: RemovertInput, cfg: RemovertConfig, sess_type: str,
              keyframe_indices: np.ndarray) -> "RemovertSession":
        kf = np.asarray(keyframe_indices)
        K = len(kf)
        # keyframe capacity: auto = pow-2 bucket of the real count (bounds
        # recompiles across sessions of similar size); an explicit cap that
        # is too small escalates with a warning — NEVER silently truncates
        k_auto = 1 << max(3, (max(K, 1) - 1).bit_length())
        if cfg.max_keyframes is None:
            k_cap = k_auto
        elif cfg.max_keyframes < K:
            log.warning("%s: max_keyframes=%d < %d parsed keyframes — "
                        "escalating capacity to %d (use keyframe_gap to subsample)",
                        sess_type, cfg.max_keyframes, K, k_auto)
            k_cap = k_auto
        else:
            k_cap = cfg.max_keyframes
        s_cap = cfg.scan_capacity

        lidar2base = np.asarray(cfg.extrinsic_lidar_to_base, np.float64).reshape(4, 4)
        poses = np.tile(np.eye(4, dtype=np.float32), (k_cap, 1, 1))
        names = []
        for out_i, scan_i in enumerate(kf):
            poses[out_i] = (inp.poses[scan_i] @ lidar2base).astype(np.float32)
            names.append(inp.names[scan_i] if inp.names else f"{scan_i:06d}.pcd")
        valid = np.zeros(k_cap, bool)
        valid[:K] = True

        if cfg.device_scan_prep and K > 0:
            # batched preclean + voxel downsample on device (one program for
            # the whole session; shapes pow-2 bucketed to bound recompiles)
            max_len = max(len(inp.scans[i]) for i in kf)
            raw_cap = 1 << max(12, (max(max_len, 1) - 1).bit_length())
            k_pad = ((K + 7) // 8) * 8
            raw = np.zeros((k_pad, raw_cap, 3), np.float32)
            rmask = np.zeros((k_pad, raw_cap), bool)
            for out_i, scan_i in enumerate(kf):
                s = np.asarray(inp.scans[scan_i], np.float32)[:, :3]
                raw[out_i, : len(s)] = s
                rmask[out_i, : len(s)] = True
            ds_xyz, ds_mask, nvox = _prep_scans_device(
                jnp.asarray(raw), jnp.asarray(rmask), cfg.downsample_voxel_size,
                cfg.preclean_radius, cfg.preclean_z_band, s_cap)
            n_over = int(jnp.sum(nvox[:K] > s_cap))
            if n_over:
                log.warning("%s: %d/%d scans exceed scan_capacity=%d voxels — "
                            "uniformly merged to fit", sess_type, n_over, K, s_cap)
            scans_xyz = jnp.zeros((k_cap, s_cap, 3), jnp.float32).at[:K].set(ds_xyz[:K])
            scans_mask = jnp.zeros((k_cap, s_cap), bool).at[:K].set(ds_mask[:K])
        else:
            # thread-pooled host prep (the native voxel grid releases the
            # GIL), then a transfer of only the REAL keyframe rows + lengths
            # — masks are contiguous-front, so lengths suffice and the
            # padded k_cap/mask layout is materialized device-side
            import os
            from concurrent.futures import ThreadPoolExecutor

            k_pad = ((K + 7) // 8) * 8
            xyz = np.zeros((k_pad, s_cap, 3), np.float32)
            lens = np.zeros(k_pad, np.int32)
            n_trunc = np.zeros(k_pad, np.int32)

            def prep_one(out_i, scan_i):
                scan = _preclean(np.asarray(inp.scans[scan_i], np.float32),
                                 cfg.preclean_radius, cfg.preclean_z_band)
                pts = _voxel_downsample_host(scan[:, :3], cfg.downsample_voxel_size).astype(np.float32)
                if len(pts) > s_cap:
                    n_trunc[out_i] = len(pts) - s_cap
                    sel = np.linspace(0, len(pts) - 1, s_cap).astype(np.int64)
                    pts = pts[sel]
                xyz[out_i, : len(pts)] = pts
                lens[out_i] = len(pts)

            with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
                list(ex.map(prep_one, range(K), kf))
            if n_trunc.any():
                log.warning("%s: %d/%d scans exceed scan_capacity=%d voxels — "
                            "uniformly subsampled (%d points dropped); raise "
                            "scan_capacity for full density", sess_type,
                            int((n_trunc > 0).sum()), K, s_cap, int(n_trunc.sum()))
            xyz_j = jnp.asarray(xyz)
            mask_rows = jnp.arange(s_cap, dtype=jnp.int32)[None, :] < jnp.asarray(lens)[:, None]
            scans_xyz = jnp.zeros((k_cap, s_cap, 3), jnp.float32).at[:K].set(xyz_j[:K])
            scans_mask = jnp.zeros((k_cap, s_cap), bool).at[:K].set(mask_rows[:K])
        poses_j = jnp.asarray(poses)
        poses_inv = jnp.asarray(np.linalg.inv(poses.astype(np.float64)).astype(np.float32))
        # max sensor range over valid returns: the exact culling bound for
        # forward discrepancy sweeps is max_scan_range + diff_threshold
        # (ltm.kernels.blocks docstring)
        r2max = jnp.max(jnp.where(scans_mask & valid[:, None],
                                  jnp.sum(scans_xyz * scans_xyz, axis=-1), 0.0))
        max_scan_range = float(np.sqrt(float(r2max)))
        # map capacity: merge once at the configured/guessed capacity, then
        # re-merge at the pow-2 bucket of the TRUE voxel count when the guess
        # was wrong — auto mode both escalates (never drops voxels) and
        # shrinks (padded capacity costs every downstream stage)
        cap = cfg.map_capacity if cfg.map_capacity is not None else (1 << 20)
        valid_scan_mask = scans_mask & valid[:, None]
        map_xyz, map_mask, nvox = _merge_global(
            scans_xyz, valid_scan_mask, poses_j, cfg.downsample_voxel_size, cap
        )
        n_real = int(nvox)
        want = 1 << max(12, (max(n_real, 1) - 1).bit_length())
        if cfg.map_capacity is None:
            if want != cap:
                map_xyz, map_mask, nvox = _merge_global(
                    scans_xyz, valid_scan_mask, poses_j, cfg.downsample_voxel_size, want
                )
        elif n_real > cap:
            log.warning("%s: %d voxels exceed map_capacity=%d — escalating to %d",
                        sess_type, n_real, cap, want)
            map_xyz, map_mask, nvox = _merge_global(
                scans_xyz, valid_scan_mask, poses_j, cfg.downsample_voxel_size, want
            )
        bm = None
        if cfg.use_block_map:
            # auto block budget: 1.25x slack over the perfectly packed count
            # (cells spill partial blocks) — kept tight because the blocked
            # flat layout is the canonical map layout and every downstream
            # stage (kNN query sets, mask algebra) pays for its padding; the
            # doubling loop below absorbs sparse maps
            b_cap = cfg.block_capacity
            if cfg.n_blocks is not None:
                n_blocks = cfg.n_blocks
            else:
                need = max((n_real * 5 + 4 * b_cap - 1) // (4 * b_cap), 1)
                n_blocks = 1 << (need - 1).bit_length()
            for _attempt in range(6):
                bm, overflow = build_block_map(
                    map_xyz, map_mask, cfg.block_cell_size, n_blocks, b_cap
                )
                if int(overflow) == 0:
                    break
                log.warning("%s: block map overflow (%d pts) at n_blocks=%d — doubling",
                            sess_type, int(overflow), n_blocks)
                n_blocks *= 2
            else:
                raise ValueError(
                    f"{sess_type}: block map overflow persists at n_blocks={n_blocks}; "
                    f"raise block_capacity ({b_cap}) or block_cell_size ({cfg.block_cell_size})"
                )
            # the blocked flat layout becomes the canonical map layout so all
            # downstream masks index it directly
            map_xyz, map_mask = bm.flat_xyz(), bm.flat_mask()
        return cls(
            sess_type=sess_type,
            num_keyframes=K,
            keyframe_indices=kf,
            names=names,
            poses=poses_j,
            poses_inv=poses_inv,
            kf_valid=jnp.asarray(valid),
            scans_xyz=scans_xyz,
            scans_mask=scans_mask & jnp.asarray(valid)[:, None],
            map_xyz=map_xyz,
            map_mask=map_mask,
            bm=bm,
            max_scan_range=max_scan_range,
        )
