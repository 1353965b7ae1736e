"""LT-SLAM end-to-end throughput on real hardware (synthetic ParkingLot).

Runs the full multi-session pipeline (load -> anchored optimize -> SC
retrieval -> ICP verification -> optimize -> RS loops -> optimize) on a
two-session synthetic survey and reports wall clock, per-stage breakdown
(stage timers at INFO), loop counts, and ATE vs the generator's ground
truth.  The ICP-iteration summary line printed by the pipeline is the input
for lane-compaction tuning.

Usage: python -m tools.slam_bench [num_keyframes [max_scan_points]]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ltm.core.config import LTSlamConfig
    from ltm.io.synthetic import make_two_sessions
    from ltm.slam import LTSlam

    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 12000

    t0 = time.perf_counter()
    bundle = make_two_sessions(seed=11, num_keyframes=n_kf, num_cars=12,
                               num_changed=4, max_scan_points=n_pts,
                               scan_range=70.0)
    print(f"synthetic sessions: {time.perf_counter() - t0:.1f} s "
          f"({n_kf} keyframes x {n_pts} pts each)")

    cfg = LTSlamConfig()
    cfg.max_nodes_per_session = max(256, n_kf)

    for label in ("cold", "warm"):
        slam = LTSlam(cfg)
        t0 = time.perf_counter()
        result = slam.run(bundle["central"].data, bundle["query"].data,
                          save_directory=None)
        dt = time.perf_counter() - t0
        total_kf = 2 * n_kf
        print(f"[{label}] wall {dt:.1f} s | {total_kf / dt:.2f} keyframes/s | "
              f"{result.num_sc_loops} SC + {result.num_rs_loops} RS loops")

    # alignment quality vs generator ground truth (anchor of query session)
    gt_anchor = bundle["query"].anchor
    est_anchor = np.asarray(result.anchors[bundle["query"].data.name])
    err = np.linalg.inv(gt_anchor) @ est_anchor
    t_err = np.linalg.norm(err[:3, 3])
    r_err = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))
    print(f"anchor error vs GT: {t_err:.3f} m / {r_err:.3f} deg")


if __name__ == "__main__":
    main()
