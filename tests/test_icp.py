import jax.numpy as jnp
import numpy as np

from ltm.core import se3
from ltm.register import icp_batch, icp_point_to_point, fitness_score


def structured_cloud(rng, n=1500):
    """Non-degenerate scene: three walls + ground + clutter."""
    g = rng.uniform(-10, 10, size=(n // 3, 2))
    ground = np.concatenate([g, np.zeros((len(g), 1))], -1)
    w1 = np.stack([rng.uniform(-10, 10, n // 4), np.full(n // 4, 8.0), rng.uniform(0, 3, n // 4)], -1)
    w2 = np.stack([np.full(n // 4, -9.0), rng.uniform(-10, 10, n // 4), rng.uniform(0, 3, n // 4)], -1)
    clutter = rng.uniform(-8, 8, size=(n - len(ground) - len(w1) - len(w2), 3)) * np.array([1, 1, 0.3])
    return np.concatenate([ground, w1, w2, clutter]).astype(np.float32)


def test_icp_recovers_known_transform(rng):
    src = structured_cloud(rng)
    T_gt = np.asarray(se3.from_rpy(0.0, 0.0, 0.15, t=[0.8, -0.5, 0.1]))
    tgt = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    n = len(src)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt.astype(np.float32)), jnp.ones(n, bool),
        max_iterations=60, tile=1024,
    )
    err = np.asarray(se3.log(se3.between(jnp.asarray(T_gt, jnp.float32), res.transform)))
    assert np.abs(err).max() < 1e-3, err
    assert float(res.fitness) < 1e-4
    assert bool(res.converged)


def test_icp_fitness_on_mismatch(rng):
    src = structured_cloud(rng, 600)
    tgt = structured_cloud(np.random.default_rng(99), 600) + np.array([30, 0, 0], np.float32)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(len(src), bool), jnp.asarray(tgt), jnp.ones(len(tgt), bool),
        max_iterations=25, tile=1024,
    )
    # unrelated scene far away: fitness should be large
    assert float(res.fitness) > 0.5


def test_fitness_matches_oracle(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tgt = rng.normal(size=(200, 3)).astype(np.float32)
    T = jnp.eye(4)
    f = float(fitness_score(jnp.asarray(src), jnp.ones(100, bool), jnp.asarray(tgt), jnp.ones(200, bool), T, tile=64))
    d2 = ((src[:, None] - tgt[None]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(f, d2.mean(), rtol=1e-4)


def test_icp_batch(rng):
    src = structured_cloud(rng, 900)
    T1 = np.asarray(se3.from_rpy(0, 0, 0.1, t=[0.5, 0.2, 0.0]))
    T2 = np.asarray(se3.from_rpy(0, 0, -0.08, t=[-0.4, 0.6, 0.0]))
    tgts = np.stack([src @ T[:3, :3].T + T[:3, 3] for T in (T1, T2)]).astype(np.float32)
    srcs = np.stack([src, src])
    masks = np.ones((2, len(src)), bool)
    res = icp_batch(jnp.asarray(srcs), jnp.asarray(masks), jnp.asarray(tgts), jnp.asarray(masks),
                    max_iterations=50, tile=1024)
    for b, T_gt in enumerate((T1, T2)):
        err = np.asarray(se3.log(se3.between(jnp.asarray(T_gt, jnp.float32), res.transform[b])))
        assert np.abs(err).max() < 2e-3, (b, err)


def test_icp_empty_target():
    src = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)), jnp.float32)
    res = icp_point_to_point(src, jnp.ones(50, bool), src, jnp.zeros(50, bool), max_iterations=5, tile=64)
    assert not bool(res.converged)


def test_icp_coarse_to_fine(rng):
    src = structured_cloud(rng)
    T_gt = np.asarray(se3.from_rpy(0.0, 0.0, 0.12, t=[0.7, -0.4, 0.1]))
    tgt = (src @ T_gt[:3, :3].T + T_gt[:3, 3]).astype(np.float32)
    n = len(src)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt), jnp.ones(n, bool),
        max_iterations=40, tile=1024, coarse_iterations=25, coarse_stride=4,
    )
    err = np.asarray(se3.log(se3.between(jnp.asarray(T_gt, jnp.float32), res.transform)))
    assert np.abs(err).max() < 2e-3, err
    assert float(res.fitness) < 1e-3


def test_icp_converged_pcl_semantics_max_iter(rng):
    """PCL hasConverged() parity: a max-iteration exit still reports
    converged=True (failure_after_max_iter defaults false in PCL), with
    criterion CRIT_MAX_ITER (reference accept test LTslam.cpp:222)."""
    from ltm.register.icp import CRIT_MAX_ITER

    src = structured_cloud(rng, 800)
    tgt = (src + rng.normal(0, 0.05, src.shape)).astype(np.float32)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(len(src), bool), jnp.asarray(tgt),
        jnp.ones(len(tgt), bool), max_iterations=2,
        transformation_epsilon=1e-30, euclidean_fitness_epsilon=0.0, tile=1024,
    )
    assert bool(res.converged)
    assert int(res.iterations) == 2
    assert int(res.criterion) == CRIT_MAX_ITER


def test_icp_abs_mse_criterion_stops_early(rng):
    """The euclidean-fitness (absolute MSE change) criterion ends the loop
    when correspondence MSE plateaus before the transform epsilon fires."""
    from ltm.register.icp import CRIT_ABS_MSE

    src = structured_cloud(rng, 800)
    tgt = (src + rng.normal(0, 0.05, src.shape)).astype(np.float32)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(len(src), bool), jnp.asarray(tgt),
        jnp.ones(len(tgt), bool), max_iterations=100,
        transformation_epsilon=1e-30, euclidean_fitness_epsilon=1e-4, tile=1024,
    )
    assert bool(res.converged)
    assert int(res.iterations) < 100
    assert int(res.criterion) == CRIT_ABS_MSE


def test_icp_transform_eps_fires_far_from_origin(rng):
    """Regression for the f32-dead criterion: PCL's transform test examines
    the INCREMENTAL delta (≈identity at convergence), so it must fire at the
    default 1e-6 even when the clouds sit far from the origin — where the old
    sum((T_new-T)^2) form carried the pose scale and never sank below 1e-6,
    pushing every pair to the 100-iteration cap (reference converges early,
    LTslam.cpp:206-211 evaluates in double)."""
    from ltm.register.icp import CRIT_TRANSFORM_EPS

    src = structured_cloud(rng) + np.array([450.0, -380.0, 12.0], np.float32)
    T_gt = np.asarray(se3.from_rpy(0.0, 0.0, 0.1, t=[0.6, -0.3, 0.05]))
    tgt = (src @ T_gt[:3, :3].T + T_gt[:3, 3]).astype(np.float32)
    n = len(src)
    res = icp_point_to_point(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt), jnp.ones(n, bool),
        max_iterations=100, tile=1024,
    )
    assert bool(res.converged)
    assert int(res.iterations) < 50, int(res.iterations)
    assert int(res.criterion) in (CRIT_TRANSFORM_EPS,), int(res.criterion)
    err = np.asarray(se3.log(se3.between(jnp.asarray(T_gt, jnp.float32), res.transform)))
    assert np.abs(err).max() < 5e-3, err


def test_icp_batch_compacted_matches_batch(rng):
    """Lane compaction must be result-invariant: each pair's iteration
    sequence is independent of batching, so the compacted farm returns the
    fused vmapped batch's transforms/fitness/iterations bitwise."""
    from ltm.register.icp import icp_batch_compacted

    src = structured_cloud(rng, 700)
    n = len(src)
    pairs = []
    for i in range(5):
        T = np.asarray(se3.from_rpy(0, 0, 0.05 * (i + 1), t=[0.3 * i, -0.2, 0.0]))
        tgt = (src @ T[:3, :3].T + T[:3, 3] +
               rng.normal(0, 0.01 * (i + 1), src.shape)).astype(np.float32)
        pairs.append(tgt)
    srcs = jnp.asarray(np.stack([src] * 5))
    tgts = jnp.asarray(np.stack(pairs))
    masks = jnp.ones((5, n), bool)

    ref = icp_batch(srcs, masks, tgts, masks, max_iterations=60, tile=1024)
    got = icp_batch_compacted(srcs, masks, tgts, masks, max_iterations=60,
                              tile=1024, segment=13, width=2)
    np.testing.assert_array_equal(np.asarray(ref.iterations), np.asarray(got.iterations))
    np.testing.assert_allclose(np.asarray(ref.transform), np.asarray(got.transform),
                               atol=0, rtol=0)
    # fitness batches under a different vmap width -> f32 reduction-order
    # ulp differences; transforms/iterations above are bitwise
    np.testing.assert_allclose(np.asarray(ref.fitness), np.asarray(got.fitness),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.criterion), np.asarray(got.criterion))

    # lane-bucket padding (the sticky pow-2 farm bucket in
    # LTSlam._run_icp_batches) fills the bucket with EMPTY lanes (all-False
    # masks, lane-0 point data): they are retired before the first segment
    # and the real lanes' results must be bitwise unchanged
    pad = 16 - 5
    srcs_p = jnp.concatenate([srcs, jnp.broadcast_to(srcs[:1], (pad, n, 3))])
    tgts_p = jnp.concatenate([tgts, jnp.broadcast_to(tgts[:1], (pad, n, 3))])
    masks_p = jnp.concatenate([masks, jnp.zeros((pad, n), bool)])
    got_p = icp_batch_compacted(srcs_p, masks_p, tgts_p, masks_p,
                                max_iterations=60, tile=1024, segment=13, width=2)
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(got_p.iterations)[:5])
    np.testing.assert_allclose(np.asarray(got.transform),
                               np.asarray(got_p.transform)[:5], atol=0, rtol=0)
    assert not np.asarray(got_p.converged)[5:].any()   # pads never ran
