"""Lifelong meta-map maintenance: incremental change composition over N
sessions (BASELINE.json config 4 — "lifelong meta-map").

The reference runs LT-removert pairwise and leaves chaining to the user
(modules talk through files, ``README.md:24``).  This driver automates the
lifelong loop: the live map starts as session 1; each new session is
change-detected against the live map (Removerter), and the composed
updated scans become the live map for the next round — so newly appeared
structure (PD) accumulates and disappeared structure (ND) is retired
round after round.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import numpy as np

from ltm.core.config import RemovertConfig
from ltm.removert.pipeline import Removerter, RemovertResult
from ltm.removert.session import RemovertInput
from ltm.utils import get_logger, stage_timer

__all__ = ["LifelongResult", "lifelong_update"]

log = get_logger("ltm.ltmap.lifelong")


@dataclass
class LifelongResult:
    live_map: np.ndarray                      # final composed map (M, 3)
    rounds: List[RemovertResult] = field(default_factory=list)
    round_stats: List[Dict] = field(default_factory=list)


def _all_winners_packed(comb, upd, pose_inv, fov, proj_shape):
    """(K, ceil(N/8)) bit-packed winner masks for ALL keyframes in one jitted
    scan — replaces a per-keyframe Python loop whose N-sized boolean host
    transfers dominated at scale (one 8x-compressed transfer instead of K)."""
    import jax
    import jax.numpy as jnp

    from ltm.kernels.projection import apply_pose, winner_mask

    @partial(jax.jit, static_argnames=("fov", "proj_shape"))
    def run(comb, upd, pose_inv, fov, proj_shape):
        def body(_, Tinv):
            local = apply_pose(comb, Tinv)
            win, *_ = winner_mask(local, upd, fov, proj_shape)
            return None, jnp.packbits(win)

        _, out = jax.lax.scan(body, None, pose_inv)
        return out

    return run(comb, upd, pose_inv, fov, proj_shape)


def _updated_scans_as_input(result: RemovertResult, base: RemovertInput,
                            cfg: RemovertConfig, fov) -> RemovertInput:
    """Per-keyframe updated scans (winner reprojection of the updated map +
    weak-ND + PD, ``updateScansScanwise``) as the next round's live session."""
    from ltm.kernels.projection import rimg_shape

    proj_shape = rimg_shape(fov, cfg.reprojection_alpha)
    c = result.central
    scans = []
    kf = c.keyframe_indices
    comb = result.combined_xyz
    upd = result.masks["updated"]
    K = c.num_keyframes
    packed = np.asarray(_all_winners_packed(comb, upd, c.poses_inv[:K], fov, proj_shape))
    comb_h = np.asarray(comb)
    n = comb_h.shape[0]
    pinv_h = np.asarray(c.poses_inv[:K])
    for k in range(K):
        win = np.unpackbits(packed[k])[:n].astype(bool)
        pts = (comb_h[win] @ pinv_h[k, :3, :3].T + pinv_h[k, :3, 3]).astype(np.float32)
        scans.append(np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1).astype(np.float32))
    # session poses store base∘lidar2base; RemovertInput expects base poses
    # (the extrinsic is re-applied at build time)
    lidar2base_inv = np.linalg.inv(np.asarray(cfg.extrinsic_lidar_to_base, np.float64).reshape(4, 4))
    poses = np.asarray(c.poses[: c.num_keyframes], np.float64) @ lidar2base_inv
    return RemovertInput(scans=scans, poses=poses,
                         names=[f"{i:06d}.pcd" for i in range(len(scans))])


def lifelong_update(sessions: List[RemovertInput], cfg: Optional[RemovertConfig] = None,
                    save_directory: Optional[str] = None) -> LifelongResult:
    """Fold sessions[1:] into the live map seeded by sessions[0].

    Shape stability across rounds: ONE ``Removerter`` serves every round
    (mesh + per-map caches persist), and when ``map_capacity`` is auto, the
    first round's bucket (with 2× headroom) is locked in for the remaining
    rounds — the live map's size drifts as PD accrues/ND retires, and
    without the lock each drift past a pow-2 boundary would recompile the
    whole sweep program set mid-chain.  A session that outgrows the locked
    capacity still escalates with a warning (nothing truncates)."""
    import dataclasses

    cfg = dataclasses.replace(cfg) if cfg is not None else RemovertConfig()
    fov = (cfg.vfov, cfg.hfov)
    live = sessions[0]
    out = LifelongResult(live_map=np.zeros((0, 3)))
    if cfg.map_capacity is None and len(sessions) >= 2:
        # lock the map capacity BEFORE round 1 from a cheap host-side voxel
        # count of the first two sessions (what prep computes anyway), with
        # 2x headroom for PD/ND drift down the chain — one compile set serves
        # every round (the old post-round-1 lock paid a second full compile
        # set mid-chain: 591 s measured on the 6-session bench, PERF.md).
        # A later session that outgrows it still escalates with a warning.
        from ltm.removert.session import estimate_map_voxel_count

        with stage_timer("lifelong.capacity_estimate", log):
            n_max = max(estimate_map_voxel_count(s, cfg) for s in sessions[:2])
        bucket = 1 << max(12, (max(n_max, 1) - 1).bit_length())
        cfg.map_capacity = max(4096, 2 * bucket)
        log.info("lifelong: map capacity locked at %d (est. %d voxels)",
                 cfg.map_capacity, n_max)
    rm = Removerter(cfg)
    for i, query in enumerate(sessions[1:], start=2):
        with stage_timer(f"lifelong.round_{i}", log):
            rd = os.path.join(save_directory, f"round_{i:02d}") if save_directory else None
            res = rm.run(live, query, save_directory=rd)
        out.rounds.append(res)
        stats = {
            "round": i,
            "nd": int(np.asarray(res.masks["nd"]).sum()),
            "pd": int(np.asarray(res.masks["pd"]).sum()),
            "updated": int(np.asarray(res.masks["updated"]).sum()),
        }
        out.round_stats.append(stats)
        log.info("lifelong round %d: %s", i, stats)
        live = _updated_scans_as_input(res, live, cfg, fov)
    out.live_map = res.points("updated") if out.rounds else np.zeros((0, 3))
    return out
