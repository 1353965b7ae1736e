"""Detected-set parity vs the reference algorithm (the BASELINE north star).

BASELINE.json words the change-detection bar as "reproduce its PD/ND point
sets, IoU >= 0.95 vs reference" — i.e. against what the *reference
algorithm* detects on the same inputs, not against world ground truth
(rounds 2-3 established that the world-GT e2e IoU ceiling of ~0.85 is the
reference algorithm's own structure: HD-coupling holes + GT-band ambiguity,
see PARITY.md).  ``tests/ref_oracle.py`` is a literal f64 NumPy
reimplementation of the reference detector chain; this test runs ltm's
production Removerter and the oracle on identical inputs and asserts the
named detected sets agree.
"""

import numpy as np
import pytest

from ltm.core.config import RemovertConfig
from ltm.io.synthetic import make_two_sessions
from ltm.removert import Removerter, RemovertInput

from ref_oracle import oracle_run, set_iou


@pytest.fixture(scope="module")
def parity():
    bundle = make_two_sessions(num_keyframes=8, num_cars=8, num_changed=4,
                               max_scan_points=20000, scan_range=70.0,
                               seed=23, point_noise=0.01)
    cfg = RemovertConfig()
    cfg.scan_capacity = 24576
    cfg.downsample_voxel_size = 0.1
    cfg.knn_avg_sqdist_threshold = 0.04
    cfg.save_high_dyn_maps = False

    def _input(syn):
        return RemovertInput(scans=[s for s in syn.data.scans], poses=syn.site_poses)

    res = Removerter(cfg).run(_input(bundle["central"]), _input(bundle["query"]))

    ora = oracle_run([s for s in bundle["central"].data.scans],
                     bundle["central"].site_poses,
                     [s for s in bundle["query"].data.scans],
                     bundle["query"].site_poses, cfg)
    return res, ora


NAMES = ("static_c", "static_q", "nd", "pd", "nd_strong", "nd_weak",
         "pd_strong", "pd_weak", "updated", "updated_strong")


@pytest.mark.parametrize("name", NAMES)
def test_reference_oracle_parity(parity, name):
    res, ora = parity
    iou = set_iou(res.points(name), ora[name])
    assert iou >= 0.95, (name, iou, len(res.points(name)), len(ora[name]))
