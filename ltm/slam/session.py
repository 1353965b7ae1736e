"""Device-resident session state for LT-SLAM.

Mirrors the reference ``Session`` (``ltslam/src/Session.cpp``): loaded pose
graph, Scan Context descriptors, keyframe clouds, and ICP submap assembly
(``loopFindNearKeyframesLocalCoord/CentralCoord``, ``Session.cpp:91-142``).

TPU design: all keyframe scans live in one padded ``(N, S, 3)`` array; a
submap is a gather + batched rigid transform + voxel dedupe, entirely under
jit.  Note a deliberate behavioral improvement over the reference: its
"local coord" submap stacks the ±25 neighbour scans **untransformed**
(``Session.cpp:130`` transforms by the origin pose, i.e. identity), smearing
the target cloud; we compose neighbours with their relative poses so the
submap is a real local map around the target node.  Validated against
ground truth in the pipeline tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltm.core.config import LTSlamConfig
from ltm.io.sessions import SessionData
from ltm.kernels import polar_bin
from ltm.utils import get_logger

log = get_logger("ltm.slam.session")
from ltm.kernels.voxel import voxel_downsample_representative_capped

__all__ = ["SlamSession", "assemble_submap", "auto_scan_capacity"]


def auto_scan_capacity(session_data) -> int:
    """Pow-2 bucket of the largest scan across sessions (min 512)."""
    s_max = max((len(s) for d in session_data for s in d.scans[: d.num_nodes]),
                default=1)
    return 1 << max(9, (max(s_max, 1) - 1).bit_length())


@dataclass
class SlamSession:
    """One session's device state."""

    name: str
    num_nodes: int                      # valid nodes
    poses_local: np.ndarray             # (N, 4, 4) float64 — current local estimates
    edges: tuple                        # host (from, to, rel)
    scans_xyz: jax.Array                # (N_cap, S, 3) float32
    scans_mask: jax.Array               # (N_cap, S)
    descriptors: jax.Array              # (N_cap, R, S_c) float32
    node_valid: jax.Array               # (N_cap,)
    is_base: bool
    # per-scan ICP pre-filter (submap_voxel_size representatives, compacted
    # to the row front): the ±25-neighbour submap union sorts these rows
    # instead of raw scan capacity — drivers trim the row dim to a shared
    # pow-2 bucket of max_icp_voxels (see LTSlam trim; lossless)
    scans_icp_xyz: Optional[jax.Array] = None   # (N_cap, S_icp, 3)
    scans_icp_mask: Optional[jax.Array] = None  # (N_cap, S_icp)
    _max_icp_voxels: object = 0  # device scalar until first host access

    @classmethod
    def from_session_data(cls, data: SessionData, cfg: LTSlamConfig, is_base: bool,
                          n_cap: int | None = None,
                          s_cap: int | None = None) -> "SlamSession":
        n = data.num_nodes
        if n_cap is None:
            # auto: pow-2 bucket; an explicit too-small cap escalates with a
            # warning — a session's nodes are never silently dropped
            n_auto = 1 << max(3, (max(n, 1) - 1).bit_length())
            n_cap = cfg.max_nodes_per_session if cfg.max_nodes_per_session else n_auto
            if n > n_cap:
                log.warning("session %s: max_nodes_per_session=%d < %d nodes — "
                            "escalating capacity to %d", data.name, n_cap, n, n_auto)
                n_cap = n_auto
        if s_cap is None:
            s_cap = cfg.scan_capacity
        if s_cap is None:
            # auto: pow-2 bucket of the largest scan — full density, no
            # silent truncation (reference loads full clouds,
            # ltslam/src/Session.cpp:145-179); an EXPLICIT cfg.scan_capacity
            # keeps the warn+stride-subsample behavior as a chosen operating
            # point.  Multi-session drivers pass a shared s_cap so all
            # sessions compile to one shape.
            s_cap = auto_scan_capacity([data])

        xyz = np.zeros((n_cap, s_cap, 3), np.float32)
        msk = np.zeros((n_cap, s_cap), bool)
        n_trunc = 0
        for i, scan in enumerate(data.scans[:n]):
            pts = scan[:, :3]
            if len(pts) > s_cap:
                # deterministic stride subsample to capacity
                n_trunc += 1
                sel = np.linspace(0, len(pts) - 1, s_cap).astype(np.int64)
                pts = pts[sel]
            xyz[i, : len(pts)] = pts
            msk[i, : len(pts)] = True
        if n_trunc:
            log.warning("session %s: %d/%d scans exceed scan_capacity=%d points — "
                        "stride-subsampled; raise scan_capacity for full density",
                        data.name, n_trunc, n, s_cap)
        scans_xyz = jnp.asarray(xyz)
        scans_mask = jnp.asarray(msk)

        sc = cfg.scan_context
        if data.descriptors is not None:
            d = np.zeros((n_cap, sc.num_ring, sc.num_sector), np.float32)
            d[:n] = data.descriptors[:n]
            descriptors = jnp.asarray(d)
        else:
            # the reference consumes precomputed SCDs; we can also produce them
            descriptors = polar_bin.make_descriptors(
                scans_xyz, scans_mask,
                num_ring=sc.num_ring, num_sector=sc.num_sector,
                max_radius=sc.max_radius, lidar_height=sc.lidar_height,
            )

        valid = np.zeros(n_cap, bool)
        valid[:n] = True

        # ICP-resolution pre-filter, once per session (one batched device
        # pass): each scan's 0.3-voxel representative set compacted to the
        # row front.  The submap assembly's per-pair sort then runs over
        # these rows; re-voxeling a representative set on the same
        # (scan-frame) grid is idempotent, so the source-scan filter output
        # is bit-identical to filtering the raw scan.
        icp_voxel = cfg.icp.submap_voxel_size
        icp_xyz, icp_mask, nvox = jax.vmap(
            lambda x, m: voxel_downsample_representative_capped(
                x, m, icp_voxel, s_cap))(scans_xyz, scans_mask)
        # max voxel count stays a DEVICE scalar: fetching it here would
        # serialize the next session's host build behind this session's
        # device queue; the driver fetches all sessions' maxima in one sync
        # right before trimming (max_icp_voxels property)
        max_nvox = jnp.max(jnp.where(jnp.asarray(valid), nvox, 0))

        return cls(
            name=data.name,
            num_nodes=n,
            poses_local=data.poses.copy(),
            edges=data.edges,
            scans_xyz=scans_xyz,
            scans_mask=scans_mask,
            descriptors=descriptors,
            node_valid=jnp.asarray(valid),
            is_base=is_base,
            scans_icp_xyz=icp_xyz,
            scans_icp_mask=icp_mask,
            _max_icp_voxels=max_nvox,
        )

    @property
    def max_icp_voxels(self) -> int:
        """Largest per-scan ICP-voxel count (host fetch on first access)."""
        if not isinstance(self._max_icp_voxels, int):
            self._max_icp_voxels = int(self._max_icp_voxels)
        return self._max_icp_voxels

    def trim_icp_scans(self, row_cap: int) -> None:
        """Trim the compacted ICP-filtered scans to ``row_cap`` rows
        (lossless when ``row_cap >= max_icp_voxels``; drivers pass a shared
        pow-2 bucket so all sessions compile to one submap shape)."""
        self.scans_icp_xyz = self.scans_icp_xyz[:, :row_cap]
        self.scans_icp_mask = self.scans_icp_mask[:, :row_cap]


@partial(jax.jit, static_argnames=("out_capacity",))
def assemble_submap(
    scans_xyz: jax.Array,     # (N, S, 3)
    scans_mask: jax.Array,    # (N, S)
    neighbor_idx: jax.Array,  # (K,) node indices (clipped)
    neighbor_valid: jax.Array,# (K,)
    rel_poses: jax.Array,     # (K, 4, 4) submap_frame_from_neighbor
    voxel: float,
    out_capacity: int,
):
    """Gather ±K neighbour scans, compose into the submap frame, voxel-dedupe.

    Matches ``loopFindNearKeyframes*`` + the 0.3 m ICP filter
    (``ltslam/src/Session.cpp:18,109-114``) with fixed shapes.
    """
    pts = scans_xyz[neighbor_idx]                       # (K, S, 3)
    msk = scans_mask[neighbor_idx] & neighbor_valid[:, None]
    R = rel_poses[:, :3, :3]
    t = rel_poses[:, :3, 3]
    moved = jnp.einsum("kij,ksj->ksi", R, pts, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    flat_xyz = moved.reshape(-1, 3)
    flat_msk = msk.reshape(-1)
    # One representative point per voxel with a spatially UNIFORM density
    # cap on overflow (PCL ``downSizeFilterICP`` analog at fixed shapes): a
    # ±25-keyframe union can occupy more voxels than the capacity, and the
    # previous representative+compaction path silently kept the
    # first-capacity points in ORIGINAL order — a submap biased toward the
    # leading neighbours.  representative_capped thins uniformly over the
    # sorted voxels instead (real points, no centroid blur — the centroid
    # variant measured median-15-iteration ICP and 2.4x worse ATE), and
    # costs one key-sort + a segment_min (the old path paid three 835k-row
    # sorts per pair — the dominant device cost of SC-loop prepare).
    out_xyz, out_mask, _ = voxel_downsample_representative_capped(
        flat_xyz, flat_msk, voxel, out_capacity)
    return out_xyz, out_mask
