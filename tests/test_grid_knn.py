import jax.numpy as jnp
import numpy as np

from ltm.kernels.grid_knn import build_grid_buckets, grid_knn2_sqdists
from ltm.kernels.knn import knn_sqdists


def test_grid_buckets_preserve_points(rng):
    pts = rng.uniform(-20, 20, size=(3000, 3)).astype(np.float32)
    mask = rng.uniform(size=3000) > 0.1
    gb, overflow = build_grid_buckets(jnp.asarray(pts), jnp.asarray(mask), 4.0,
                                      n_cells=2048, capacity=64)
    assert int(overflow) == 0
    got = np.asarray(gb.xyz.reshape(-1, 3))[np.asarray(gb.mask.reshape(-1))]
    ref = pts[mask]
    np.testing.assert_allclose(got[np.lexsort(got.T)], ref[np.lexsort(ref.T)], atol=0)
    # perm maps back correctly
    perm = np.asarray(gb.perm.reshape(-1))[np.asarray(gb.mask.reshape(-1))]
    np.testing.assert_allclose(np.sort(perm), np.sort(np.flatnonzero(mask)))


def test_grid_knn_matches_clamped_bruteforce(rng):
    cell = 2.0
    t = rng.uniform(-15, 15, size=(4000, 3)).astype(np.float32)
    tm = rng.uniform(size=4000) > 0.2
    q = rng.uniform(-16, 16, size=(1500, 3)).astype(np.float32)
    qm = np.ones(1500, bool)
    qm[7] = False

    qg, o1 = build_grid_buckets(jnp.asarray(q), jnp.asarray(qm), cell, n_cells=8192, capacity=32)
    tg, o2 = build_grid_buckets(jnp.asarray(t), jnp.asarray(tm), cell, n_cells=8192, capacity=64)
    assert int(o1) == 0 and int(o2) == 0

    got = np.asarray(grid_knn2_sqdists(qg, tg, num_queries=1500))
    ref = np.asarray(knn_sqdists(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(t), jnp.asarray(tm), k=2, tile=512))
    ref_clamped = np.minimum(ref, cell * cell)
    valid = qm
    np.testing.assert_allclose(got[valid], ref_clamped[valid], rtol=1e-4, atol=1e-5)


def test_grid_knn_threshold_decisions_exact(rng):
    """Every decision at thresholds <= cell_size^2 must match brute force."""
    cell = 1.0
    t = rng.uniform(-8, 8, size=(2000, 3)).astype(np.float32)
    q = t + rng.normal(scale=0.3, size=t.shape).astype(np.float32)
    ones_t = jnp.ones(len(t), bool)
    ones_q = jnp.ones(len(q), bool)
    qg, _ = build_grid_buckets(jnp.asarray(q), ones_q, cell, n_cells=8192, capacity=32)
    tg, _ = build_grid_buckets(jnp.asarray(t), ones_t, cell, n_cells=8192, capacity=32)
    got = np.asarray(grid_knn2_sqdists(qg, tg, num_queries=len(q))).mean(axis=1)
    ref = np.asarray(knn_sqdists(jnp.asarray(q), ones_q, jnp.asarray(t), ones_t, k=2, tile=512)).mean(axis=1)
    # avg-of-2 decisions are exact for t <= cell_size^2 / 2
    for thres in (0.01, 0.04, 0.25, 0.49):
        np.testing.assert_array_equal(got < thres, ref < thres)


def test_pipeline_knn_stat_paths_agree(rng):
    """Brute-force and grid paths of Removerter._knn_stat make identical
    threshold decisions."""
    import jax

    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter

    q = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    t = (q[:2500] + rng.normal(scale=0.1, size=(2500, 3))).astype(np.float32)
    qm = jnp.asarray(rng.uniform(size=3000) > 0.05)
    tm = jnp.ones(2500, bool)

    cfg = RemovertConfig()
    cfg.grid_n_cells = 8192
    cfg.grid_cell_capacity = 64
    rm = Removerter(cfg)
    d_brute = np.asarray(rm._knn_stat(jnp.asarray(q), qm, jnp.asarray(t), tm))
    cfg.use_grid_knn = True
    d_grid = np.asarray(rm._knn_stat(jnp.asarray(q), qm, jnp.asarray(t), tm))
    for thres in (cfg.knn_avg_sqdist_threshold, 0.04, cfg.weak_to_strong_sqdist_threshold):
        np.testing.assert_array_equal(d_grid < thres, d_brute < thres)
