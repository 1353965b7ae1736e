"""Lifelong meta-map loop over 3 sessions (BASELINE config 4)."""

import numpy as np
import pytest

from ltm.core.config import RemovertConfig
from ltm.io.synthetic import make_n_sessions
from ltm.ltmap.lifelong import lifelong_update
from ltm.removert import RemovertInput


def test_lifelong_chain_plumbing(monkeypatch):
    """Default-suite chain-driver coverage: the lifelong loop's host logic —
    pre-run capacity lock from the first two sessions, caller-cfg isolation,
    ONE Removerter serving every round, each round's composed output feeding
    the next round's live input, per-round stats — verified with the
    per-round Removerter stubbed out.  REAL chained execution is the
    slow-pass tests below plus the driver bench's 6-session
    ``lifelong_keyframes_per_s`` metric (bench.py, every round on TPU): a
    real 3-round chain on this 2-core CPU host is ~270 s of one-use compiles,
    all duplicating pipeline coverage the suite already has elsewhere."""
    import ltm.ltmap.lifelong as ll

    rng = np.random.default_rng(0)
    scans = [rng.uniform(-20, 20, size=(500, 3)).astype(np.float32)
             for _ in range(3)]
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    sessions = [RemovertInput(scans=scans, poses=poses) for _ in range(3)]

    runs = []
    rms = []

    class FakeResult:
        masks = {"nd": np.zeros(4, bool), "pd": np.ones(2, bool),
                 "updated": np.ones(3, bool)}

        def points(self, name):
            return np.zeros((3, 3), np.float32)

    class FakeRemoverter:
        def __init__(self, cfg):
            self.cfg = cfg
            rms.append(self)

        def run(self, live, query, save_directory=None):
            runs.append((live, query))
            return FakeResult()

    monkeypatch.setattr(ll, "Removerter", FakeRemoverter)
    monkeypatch.setattr(ll, "_updated_scans_as_input",
                        lambda res, base, cfg, fov: ("live_after", len(runs)))

    cfg = RemovertConfig()
    assert cfg.map_capacity is None
    out = ll.lifelong_update(sessions, cfg)

    assert cfg.map_capacity is None            # caller's cfg untouched (copied)
    assert len(rms) == 1                       # one driver serves every round
    locked = rms[0].cfg.map_capacity
    assert locked is not None and locked >= 4096 and (locked & (locked - 1)) == 0
    assert len(runs) == 2 and len(out.round_stats) == 2
    assert runs[0][0] is sessions[0]           # round 2: live = session 1
    assert runs[1][0] == ("live_after", 1)     # round 3: live = round 2's output
    assert [st["round"] for st in out.round_stats] == [2, 3]
    assert all(st["pd"] == 2 and st["updated"] == 3 for st in out.round_stats)


@pytest.mark.slow
def test_lifelong_three_sessions_fast(tmp_path):
    """3 tiny sessions chain through the live map with the capacity lock
    engaged (shape stability across rounds).  Slow pass: real chained
    execution (see test_lifelong_chain_plumbing for the default-suite
    rationale)."""
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
