"""Lifelong meta-map chain benchmark (BASELINE config 4, the ParkingLot
shape: 6 sequences folded into one live map, ``/root/reference`` README
102-106).  Reports wall clock per round and rounds/s with the round-3 shape
stabilization (one Removerter, locked map capacity).

Usage: python -m tools.lifelong_bench [n_sessions [n_keyframes [pts]]]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ltm.core.config import RemovertConfig
    from ltm.io.synthetic import make_n_sessions
    from ltm.ltmap.lifelong import lifelong_update
    from ltm.removert import RemovertInput

    n_sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_kf = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n_pts = int(sys.argv[3]) if len(sys.argv) > 3 else 40000

    t0 = time.perf_counter()
    bundle = make_n_sessions(n_sessions=n_sessions, num_keyframes=n_kf,
                             num_cars=10, max_scan_points=n_pts,
                             scan_range=70.0, seed=29, point_noise=0.01)
    print(f"generated {n_sessions} sessions x {n_kf} kf x {n_pts} pts: "
          f"{time.perf_counter() - t0:.1f} s")

    inputs = [RemovertInput(scans=list(s.data.scans), poses=s.site_poses)
              for s in bundle["sessions"]]
    cfg = RemovertConfig()
    cfg.scan_capacity = max(16384, 1 << (n_pts - 1).bit_length())
    cfg.downsample_voxel_size = 0.1
    cfg.knn_avg_sqdist_threshold = 0.04
    cfg.save_map_pcd = False
    cfg.save_clean_scans_pcd = False
    cfg.save_high_dyn_maps = False

    t0 = time.perf_counter()
    out = lifelong_update(inputs, cfg)
    wall = time.perf_counter() - t0
    n_rounds = len(out.rounds)
    print(f"\nlifelong chain: {n_rounds} rounds in {wall:.1f} s "
          f"({wall / n_rounds:.2f} s/round, {n_rounds / wall:.3f} rounds/s, "
          f"{n_rounds * 2 * n_kf / wall:.2f} keyframes/s)")
    for st in out.round_stats:
        print(f"  round {st['round']}: nd={st['nd']} pd={st['pd']} updated={st['updated']}")
    print(f"final live map: {out.live_map.shape[0]} pts")


if __name__ == "__main__":
    main()
