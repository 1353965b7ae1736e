"""Lifelong meta-map loop over 3 sessions (BASELINE config 4)."""

import numpy as np
import pytest

from ltm.core.config import RemovertConfig
from ltm.io.synthetic import make_n_sessions
from ltm.ltmap.lifelong import lifelong_update
from ltm.removert import RemovertInput


def test_lifelong_three_sessions_fast(tmp_path):
    """Default-suite lifelong smoke: 3 tiny sessions chain through the live
    map with the capacity lock engaged (shape stability across rounds)."""
    bundle = make_n_sessions(n_sessions=3, num_keyframes=4, num_cars=6,
                             max_scan_points=4000, scan_range=70.0,
                             seed=23, point_noise=0.01, with_mover=False)
    inputs = [RemovertInput(scans=list(s.data.scans), poses=s.site_poses)
              for s in bundle["sessions"]]
    cfg = RemovertConfig()
    cfg.scan_capacity = 4096
    cfg.downsample_voxel_size = 0.15
    cfg.knn_avg_sqdist_threshold = 0.09
    cfg.save_map_pcd = False
    cfg.save_clean_scans_pcd = False
    cfg.save_high_dyn_maps = False
    out = lifelong_update(inputs, cfg)

    assert len(out.rounds) == 2
    assert out.live_map.shape[0] > 500
    for st in out.round_stats:
        assert st["pd"] > 0 or st["nd"] > 0, st
    # capacity lock: the caller's cfg is untouched (lifelong copies it), and
    # the chain ran both rounds through ONE Removerter without truncation
    assert cfg.map_capacity is None


@pytest.mark.slow
def test_lifelong_three_sessions(tmp_path):
    bundle = make_n_sessions(n_sessions=3, num_keyframes=8, num_cars=8,
                             max_scan_points=25000, scan_range=70.0,
                             seed=21, point_noise=0.01, with_mover=False)
    # use GT site poses (post-LT-SLAM protocol)
    inputs = [RemovertInput(scans=list(s.data.scans), poses=s.site_poses)
              for s in bundle["sessions"]]
    cfg = RemovertConfig()
    cfg.max_keyframes = 8
    cfg.scan_capacity = 30000
    cfg.map_capacity = 1 << 17
    cfg.downsample_voxel_size = 0.1
    cfg.knn_avg_sqdist_threshold = 0.04
    cfg.save_map_pcd = False
    cfg.save_clean_scans_pcd = False
    out = lifelong_update(inputs, cfg)

    assert len(out.rounds) == 2
    assert out.live_map.shape[0] > 1000
    # each round detected some change (sessions differ by one car each)
    for st in out.round_stats:
        assert st["pd"] > 0 or st["nd"] > 0, st

    # the final live map contains structure from the LAST session's new car
    world = bundle["world"]
    last_car_ids = bundle["sessions"][2].car_ids
    first_car_ids = bundle["sessions"][0].car_ids
    new_car = [c for c in last_car_ids if c not in first_car_ids]
    if new_car:
        car = world.car_xyz[new_car[-1]]
        d = np.linalg.norm(out.live_map[:, None, :] - car[None, :300], axis=-1).min(axis=0)
        assert (d < 0.5).mean() > 0.3, (d < 0.5).mean()
