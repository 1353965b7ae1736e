"""LT-removert path-equivalence tests on the small fixture (block vs
flat, culled vs unculled, padded vs exact, device vs host prep) plus
capacity-escalation guards.

The full-scale quality gates (HD recall, ND/PD IoU, LT-map composition,
artifact tree) live in tests/test_removert_quality.py — split so the xdist
scheduler can balance the two expensive families across workers.
"""

import numpy as np
import pytest

from ltm.core.config import RemovertConfig
from ltm.io.synthetic import make_two_sessions
from ltm.removert import Removerter, RemovertInput


def _input_from(syn):
    # removert consumes centrally aligned poses (the LT-SLAM output);
    # here: ground-truth site poses
    return RemovertInput(scans=[s for s in syn.data.scans], poses=syn.site_poses)


@pytest.fixture(scope="module")
def small_bundle():
    """Equality-test fixture: the path-equivalence tests (block vs flat,
    culled vs unculled, padded vs exact, device vs host prep) compare two
    pipeline configurations point-set-exactly — detection quality is not
    scored, so they run at a fraction of the quality fixtures' scale.
    Shapes (4 kf / 6144-capacity scans) deliberately match
    tests/test_dist_pipeline.py's mesh-equality fixture so the two modules'
    single-device programs share the persistent compile cache."""
    return make_two_sessions(num_keyframes=4, num_cars=6, num_changed=2,
                             max_scan_points=6000, scan_range=70.0,
                             seed=11, point_noise=0.01)


def _small_cfg():
    cfg = RemovertConfig()
    cfg.scan_capacity = 6144
    cfg.downsample_voxel_size = 0.1
    cfg.knn_avg_sqdist_threshold = 0.04
    cfg.save_high_dyn_maps = False
    return cfg


@pytest.fixture(scope="module")
def small_result(small_bundle):
    return Removerter(_small_cfg()).run(_input_from(small_bundle["central"]),
                                        _input_from(small_bundle["query"]))



def test_block_map_pipeline_matches_flat(small_bundle, small_result):
    """The default (auto-sized block-local) pipeline must reproduce the flat
    whole-map pipeline's masks exactly — no block tuning keys set anywhere."""
    res = small_result   # default config = block map path, auto layout/k_blocks
    cfg = _small_cfg()
    cfg.use_block_map = False       # the reference-shaped whole-map sweep
    res_f = Removerter(cfg).run(_input_from(small_bundle["central"]),
                                _input_from(small_bundle["query"]))

    # same point sets for every named mask (layouts differ -> compare as sets)
    for name in ("static_c", "dynamic_c", "nd", "nd_strong", "pd", "updated"):
        a = res.points(name)
        b = res_f.points(name)
        assert len(a) == len(b), (name, len(a), len(b))
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


@pytest.mark.slow
def test_occlusion_culling_matches_uncull(small_bundle, small_result):
    """The occlusion-culled pipeline (hierarchical-Z footprint tests,
    kernels/occlusion.py — opt-in for enclosed geometry) must reproduce the
    default pipeline's masks exactly — culling is a working-set reduction,
    never a semantic change.  Slow pass (the feature defaults OFF; the
    occlusion kernels keep default-suite coverage in test_occlusion.py)."""
    res = small_result   # default config (culling off)
    cfg = _small_cfg()
    cfg.use_occlusion_culling = True
    res_u = Removerter(cfg).run(_input_from(small_bundle["central"]),
                                _input_from(small_bundle["query"]))

    for name in ("static_c", "dynamic_c", "static_q", "dynamic_q", "nd",
                 "nd_strong", "nd_weak", "pd", "pd_strong", "updated"):
        a = res.points(name)
        b = res_u.points(name)
        assert len(a) == len(b), (name, len(a), len(b))
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_device_scan_prep_matches_host(small_bundle):
    """The batched device preclean+downsample and the host per-scan loop must
    produce near-identical session maps (both are voxel centroids; they may
    disagree only through f32 centroid rounding at voxel borders)."""
    from ltm.removert.session import RemovertSession, parse_keyframe_indices

    inp = _input_from(small_bundle["central"])
    cfg = _small_cfg()
    # full density for THIS comparison: at a capacity below the per-scan
    # voxel count both paths uniformly subsample, and their (different but
    # individually valid) retained subsets would be compared instead of the
    # two prep implementations
    cfg.scan_capacity = 8192
    idx = parse_keyframe_indices(len(inp.scans), cfg.start_idx, 10_000, 1)

    cfg.device_scan_prep = True
    dev = RemovertSession.build(inp, cfg, "Central", idx)
    cfg.device_scan_prep = False
    host = RemovertSession.build(inp, cfg, "Central", idx)

    a = np.asarray(dev.map_xyz)[np.asarray(dev.map_mask)]
    b = np.asarray(host.map_xyz)[np.asarray(host.map_mask)]
    # tolerance-aware equivalence: same point budget, and every point of one
    # map has a counterpart of the other within 1.5 voxels.  (A plain
    # voxelized IoU was border-flip dominated on sparse fixtures: most
    # voxels hold a single point, so a 1-ulp centroid difference at a cell
    # border flips the cell — 0.88 "IoU" with both maps geometrically
    # identical to within a voxel.)
    assert abs(len(a) - len(b)) <= 0.02 * max(len(a), len(b)), (len(a), len(b))
    import jax.numpy as jnp

    from ltm.kernels.knn import nn_sqdist_argmin

    for src, dst in ((a, b), (b, a)):
        d, _ = nn_sqdist_argmin(jnp.asarray(dst), jnp.ones(len(dst), bool),
                                jnp.asarray(src), jnp.ones(len(src), bool),
                                tile=4096)
        d = np.sqrt(np.asarray(d))
        assert np.quantile(d, 0.99) < 0.15, np.quantile(d, 0.99)


def test_no_silent_truncation():
    """Capacities auto-size from the data: more keyframes than an explicit
    max_keyframes escalates (with a warning) instead of silently dropping
    scans, and map_capacity=None buckets to the true voxel count."""
    from ltm.removert.session import RemovertSession, parse_keyframe_indices

    rng = np.random.default_rng(3)
    n_kf = 40
    scans = [rng.uniform(-20, 20, (400, 3)).astype(np.float32) for _ in range(n_kf)]
    poses = np.tile(np.eye(4), (n_kf, 1, 1))
    poses[:, 0, 3] = np.arange(n_kf) * 2.0
    inp = RemovertInput(scans=scans, poses=poses)

    cfg = RemovertConfig()
    cfg.max_keyframes = 16            # too small: must escalate, not truncate
    cfg.scan_capacity = 1024
    cfg.use_block_map = False
    idx = parse_keyframe_indices(n_kf, 0, 10_000, 1)
    sess = RemovertSession.build(inp, cfg, "Central", idx)
    assert sess.num_keyframes == n_kf                 # nothing dropped
    assert sess.poses.shape[0] >= n_kf
    n_pts = int(sess.map_mask.sum())
    assert n_pts > 0
    # auto map capacity (None) = pow-2 bucket of the true voxel count
    assert sess.map_xyz.shape[0] == max(4096, 1 << (n_pts - 1).bit_length())

    # auto keyframe capacity: pow-2 bucket, no config needed
    cfg2 = RemovertConfig()
    cfg2.scan_capacity = 1024
    cfg2.use_block_map = False
    sess2 = RemovertSession.build(inp, cfg2, "Central", idx)
    assert sess2.num_keyframes == n_kf
    assert sess2.poses.shape[0] == 64


@pytest.mark.slow
def test_keyframe_padding_invariance(small_bundle, small_result):
    """max_keyframes > actual keyframes must not change any result: padded
    pose entries are identity matrices — a phantom viewpoint at the global
    origin — and must be excluded from every sweep (regression; slow pass —
    a full second pipeline run over a config-padding axis)."""
    cfg = _small_cfg()
    cfg.max_keyframes = 4 + 4  # force padding past the real keyframe count
    res_p = Removerter(cfg).run(_input_from(small_bundle["central"]),
                                _input_from(small_bundle["query"]))

    res = small_result
    for name in ("static_c", "dynamic_c", "nd", "nd_strong", "nd_weak",
                 "pd", "pd_strong", "updated"):
        a = res.points(name)
        b = res_p.points(name)
        assert len(a) == len(b), (name, len(a), len(b))
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
