"""Sub-stage profile of the LT-removert kNN-diff stage on real hardware.

Rebuilds the exact inputs the e2e bench hands `_knn_partition` (two ~776k-pt
session maps from tools/e2e_bench.py's synthetic corridor) and times each
sub-step with forced completion: block-layout build (cached), chunk-kNN
forward/reverse, and the verdict mask algebra.

Usage: python -m tools.knn_stage_profile [n_keyframes pts_per_scan]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _t(label, fn):
    import jax

    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"  {label:<42s} {dt:7.3f} s")
    return out


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter
    from ltm.removert.session import RemovertSession, parse_keyframe_indices, parse_keyframes_in_roi
    from tools.e2e_bench import synth_session

    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    rng = np.random.default_rng(0)

    cfg = RemovertConfig()
    cfg.downsample_voxel_size = 0.1
    rm = Removerter(cfg)

    from ltm.removert.session import RemovertInput

    c_scans, c_poses = synth_session(rng, n_kf, n_pts, phase=0.0)
    q_scans, q_poses = synth_session(rng, n_kf, n_pts, phase=0.25)

    t0 = time.perf_counter()
    c_idx = parse_keyframe_indices(n_kf, cfg.start_idx, cfg.end_idx, cfg.keyframe_gap)
    central = RemovertSession.build(RemovertInput(scans=c_scans, poses=c_poses), cfg, "Central", c_idx)
    roi = np.asarray(central.poses)[: central.num_keyframes].astype(np.float64)
    q_idx = parse_keyframes_in_roi(q_poses, roi, cfg.roi_inplace_threshold, cfg.keyframe_gap)
    query = RemovertSession.build(RemovertInput(scans=q_scans, poses=q_poses), cfg, "Query", q_idx)
    print(f"build both sessions: {time.perf_counter() - t0:.3f} s (cold)")
    t0 = time.perf_counter()
    central2 = RemovertSession.build(RemovertInput(scans=c_scans, poses=c_poses), cfg, "Central", c_idx)
    import jax

    jax.block_until_ready(central2.map_xyz)
    print(f"rebuild central (warm): {time.perf_counter() - t0:.3f} s")

    # HD removal first, as in the pipeline, so the static masks exist
    fov = (cfg.vfov, cfg.hfov)
    for sess in (central, query):
        rm._remove_high_dynamic(sess, fov)
    jax.block_until_ready(central.masks["static"])

    for rep in ("cold", "warm"):
        print(f"[{rep}] knn_diff sub-steps:")
        t_all = time.perf_counter()
        for tag, a, b in (("central-vs-query", central, query), ("query-vs-central", query, central)):
            sx, sm = a.map_xyz, a.map_mask & a.masks["static"]
            tx, tm = b.map_xyz, b.map_mask & b.masks["static"]
            d = _t(f"{tag}: knn stat",
                   lambda: rm._knn_stat(sx, sm, tx, tm, target_base=b.map_mask))
            _t(f"{tag}: verdict mask", lambda: sm & (d >= cfg.knn_avg_sqdist_threshold))
        print(f"  total: {time.perf_counter() - t_all:.3f} s")


if __name__ == "__main__":
    main()
