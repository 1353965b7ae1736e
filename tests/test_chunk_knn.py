import jax.numpy as jnp
import numpy as np

from ltm.kernels.blocks import build_block_map
from ltm.kernels.chunk_knn import chunk_knn_sqdists
from ltm.kernels.knn import knn_sqdists


def _bm(pts, mask, cell=8.0, n_blocks=2048, cap=64):
    bm, overflow = build_block_map(jnp.asarray(pts), jnp.asarray(mask), cell, n_blocks, cap)
    assert int(overflow) == 0
    return bm


def test_chunk_knn_matches_clamped_bruteforce(rng):
    r = 2.0
    t = rng.uniform(-30, 30, size=(5000, 3)).astype(np.float32)
    tm = rng.uniform(size=5000) > 0.2
    q = rng.uniform(-32, 32, size=(1777, 3)).astype(np.float32)
    qm = np.ones(1777, bool)
    qm[[7, 500, 1776]] = False

    bm = _bm(t, tm)
    res = chunk_knn_sqdists(jnp.asarray(q), jnp.asarray(qm), bm, None,
                            clamp_radius=r, chunk=256, k_blocks=2048, sort_cell=8.0)
    assert int(res.chunk_overflow.sum()) == 0
    ref = np.asarray(knn_sqdists(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(t),
                                 jnp.asarray(tm), k=2, tile=512))
    ref_clamped = np.minimum(ref, r * r)
    got = np.asarray(res.sqdists)
    np.testing.assert_allclose(got[qm], ref_clamped[qm], rtol=1e-4, atol=1e-5)
    assert np.all(got[~qm] > 1e29)
    # order maps sorted positions back to original indices (a permutation)
    np.testing.assert_array_equal(np.sort(np.asarray(res.order)), np.arange(1777))


def test_chunk_knn_threshold_decisions_exact(rng):
    """Decisions at avg-thresholds <= r^2/k must match brute force exactly."""
    r = 1.5
    t = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    q = t + rng.normal(scale=0.4, size=t.shape).astype(np.float32)
    ones = jnp.ones(len(t), bool)
    bm = _bm(t, np.ones(len(t), bool), cell=5.0, n_blocks=512, cap=64)
    res = chunk_knn_sqdists(jnp.asarray(q), ones, bm, None,
                            clamp_radius=r, chunk=128, k_blocks=512, sort_cell=5.0)
    assert int(res.chunk_overflow.sum()) == 0
    got = np.asarray(res.sqdists).mean(axis=1)
    ref = np.asarray(knn_sqdists(jnp.asarray(q), ones, jnp.asarray(t), ones,
                                 k=2, tile=512)).mean(axis=1)
    for thres in (0.01, 0.04, 0.25, 1.0):  # all <= r^2/k = 1.125
        np.testing.assert_array_equal(got < thres, ref < thres)


def test_chunk_knn_target_extra_mask(rng):
    """target_extra restricts the target set (blocked layout indexing)."""
    r = 2.0
    t = rng.uniform(-20, 20, size=(4000, 3)).astype(np.float32)
    bm = _bm(t, np.ones(len(t), bool))
    extra = np.asarray(rng.uniform(size=bm.num_blocks * bm.block_capacity) > 0.5)
    q = rng.uniform(-20, 20, size=(900, 3)).astype(np.float32)
    ones_q = jnp.ones(len(q), bool)

    res = chunk_knn_sqdists(jnp.asarray(q), ones_q, bm, jnp.asarray(extra),
                            clamp_radius=r, chunk=128, k_blocks=2048, sort_cell=8.0)
    assert int(res.chunk_overflow.sum()) == 0
    flat_xyz = np.asarray(bm.flat_xyz())
    flat_mask = np.asarray(bm.flat_mask()) & extra
    ref = np.asarray(knn_sqdists(jnp.asarray(q), ones_q, jnp.asarray(flat_xyz),
                                 jnp.asarray(flat_mask), k=2, tile=512))
    np.testing.assert_allclose(np.asarray(res.sqdists), np.minimum(ref, r * r),
                               rtol=1e-4, atol=1e-5)


def test_chunk_knn_overflow_reported(rng):
    """k_blocks too small for the chunk ball -> per-chunk overflow > 0."""
    t = rng.uniform(-40, 40, size=(8000, 3)).astype(np.float32)
    bm = _bm(t, np.ones(len(t), bool), cell=4.0, n_blocks=16384, cap=16)
    # one giant chunk spanning the whole map needs many blocks
    q = rng.uniform(-40, 40, size=(512, 3)).astype(np.float32)
    res = chunk_knn_sqdists(jnp.asarray(q), jnp.ones(512, bool), bm, None,
                            clamp_radius=2.0, chunk=512, k_blocks=4, sort_cell=1000.0)
    assert int(res.chunk_overflow.sum()) > 0
    # one real chunk (rest are all-padding groups with zero overflow)
    assert int((res.chunk_overflow > 0).sum()) == 1


def test_pipeline_knn_stat_chunk_path_agrees(rng):
    """The chunk-kNN _knn_stat path (incl. the overflow brute-force fallback)
    makes identical threshold decisions to brute force."""
    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter

    t = rng.uniform(-12, 12, size=(2500, 3)).astype(np.float32)
    q = np.concatenate([
        (t[:2000] + rng.normal(scale=0.1, size=(2000, 3))).astype(np.float32),
        rng.uniform(-12, 12, size=(1000, 3)).astype(np.float32),
    ])
    qm = jnp.asarray(rng.uniform(size=3000) > 0.05)
    tm = jnp.asarray(rng.uniform(size=2500) > 0.1)

    cfg = RemovertConfig()
    rm = Removerter(cfg)
    cfg.use_chunk_knn = False
    d_brute = np.asarray(rm._knn_stat(jnp.asarray(q), qm, jnp.asarray(t), tm))
    cfg.use_chunk_knn = True
    cfg.chunk_knn_min_targets = 0
    cfg.chunk_knn_chunk = 256
    cfg.chunk_knn_block_cell = 6.0
    cfg.chunk_knn_k_blocks = 8  # deliberately small: exercises the brute fallback
    d_chunk = np.asarray(rm._knn_stat(jnp.asarray(q), qm, jnp.asarray(t), tm))
    for thres in (cfg.knn_avg_sqdist_threshold, 0.04, cfg.weak_to_strong_sqdist_threshold):
        np.testing.assert_array_equal(d_chunk < thres, d_brute < thres)


def test_large_coordinate_exactness(rng):
    """kNN decisions must survive km-scale coordinates: the matmul form
    |q|²+|t|²-2q·t loses ~|coord|²·eps ≈ 0.5 m² there, which silently
    corrupts top-k selection (f64-oracle regression)."""
    off = np.array([2000.0, 500.0, 0.0], np.float32)
    t = (rng.uniform(-12, 12, size=(3000, 3)).astype(np.float32) + off)
    q = t[:1500] + rng.normal(scale=0.25, size=(1500, 3)).astype(np.float32)
    ones_t = jnp.ones(3000, bool)
    ones_q = jnp.ones(1500, bool)

    # f64 oracle
    d64 = np.sum((q[:, None, :].astype(np.float64) - t[None, :, :].astype(np.float64)) ** 2, -1)
    ref = np.sort(d64, axis=1)[:, :2].mean(axis=1)

    # brute (slack-refined scan)
    got_b = np.asarray(knn_sqdists(jnp.asarray(q), ones_q, jnp.asarray(t), ones_t,
                                   k=2, tile=512)).mean(axis=1)
    np.testing.assert_allclose(got_b, ref, rtol=1e-4, atol=1e-5)

    # chunked (direct-form distances)
    bm = _bm(t, np.ones(3000, bool), cell=6.0, n_blocks=1024, cap=64)
    res = chunk_knn_sqdists(jnp.asarray(q), ones_q, bm, None,
                            clamp_radius=2.0, chunk=128, k_blocks=512, sort_cell=6.0)
    assert int(res.chunk_overflow.sum()) == 0
    got_c = np.asarray(res.sqdists).mean(axis=1)
    ref_clamped = np.minimum(np.sort(d64, axis=1)[:, :2], 4.0).mean(axis=1)
    np.testing.assert_allclose(got_c, ref_clamped, rtol=1e-4, atol=1e-5)
