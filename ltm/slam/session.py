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
from ltm.kernels.voxel import voxel_downsample_representative

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
        )


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
    out_xyz, out_mask, _ = voxel_downsample_representative(flat_xyz, flat_msk, voxel, out_capacity)
    return out_xyz, out_mask
