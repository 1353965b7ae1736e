"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltm.core import se3
from ltm.core.config import SolverConfig
from ltm.dist import (
    knn_avg_sqdist_sharded,
    make_mesh,
    sc_distance_sharded,
    solve_sharded,
    sweep_discrepancy_sharded,
)
from ltm.graph import build_graph_data, solve
from ltm.kernels.knn import knn_avg_sqdist
from ltm.kernels.projection import sweep_discrepancy
from ltm.retrieval.scancontext import sc_distance_matrix


@pytest.fixture(scope="module")
def mesh(cpu_devices=None):
    devs = jax.devices()
    assert len(devs) == 8
    return make_mesh(devs)


def test_sweep_discrepancy_sharded_matches(rng, mesh):
    fov, shape = (50.0, 360.0), (25, 180)
    mp = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32) * 25)
    mmask = jnp.asarray(rng.uniform(size=1024) > 0.1)
    K = 11  # deliberately not divisible by 8
    scans = jnp.asarray(rng.normal(size=(K, 512, 3)).astype(np.float32) * 25)
    smask = jnp.ones((K, 512), bool)
    pose_inv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))

    ref = sweep_discrepancy(mp, mmask, scans, smask, pose_inv, fov, shape, 0.1, False)
    out = sweep_discrepancy_sharded(mesh, mp, mmask, scans, smask, pose_inv, fov, shape, 0.1, False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_sharded_matches(rng, mesh):
    q = jnp.asarray(rng.normal(size=(333, 3)).astype(np.float32))
    qm = jnp.ones(333, bool)
    t = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
    tm = jnp.asarray(rng.uniform(size=500) > 0.2)
    ref = knn_avg_sqdist(q, qm, t, tm, k=2, tile=128)
    out = knn_avg_sqdist_sharded(mesh, q, qm, t, tm, k=2, tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_sc_distance_sharded_matches(rng, mesh):
    q = jnp.asarray(rng.uniform(0, 4, size=(13, 20, 60)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 4, size=(9, 20, 60)).astype(np.float32))
    ref_d, ref_s = sc_distance_matrix(q, t, full_shift_search=True)
    out_d, out_s = sc_distance_sharded(mesh, q, t, full_shift_search=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d), atol=1e-5)


def test_solve_sharded_matches_single_device(mesh):
    from tests.test_graph import make_chain

    n = 12
    gt, odo, init = make_chain(n, noise=0.04)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    betweens = [(i, i + 1, odo[i], (1e-4,) * 6, False) for i in range(n - 1)]
    rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    betweens.append((0, n - 1, rel, (1e-3,) * 6, True))
    g = build_graph_data(init, fixed, betweens=betweens)

    cfg = SolverConfig(max_outer_iterations=15)
    poses_ref, info_ref = solve(g, cfg)
    poses_sh, info_sh = solve_sharded(g, mesh, cfg)

    err = np.asarray(se3.log(se3.between(poses_ref, poses_sh)))
    assert np.abs(err).max() < 1e-3, np.abs(err).max()
    np.testing.assert_allclose(float(info_sh.cost_final), float(info_ref.cost_final), rtol=0.05, atol=1e-4)


def test_sweep_map_sharded_matches(rng, mesh):
    from ltm.dist import sweep_discrepancy_map_sharded

    fov, shape = (50.0, 360.0), (25, 180)
    mp = jnp.asarray(rng.normal(size=(1021, 3)).astype(np.float32) * 25)  # not divisible by 8
    mmask = jnp.asarray(rng.uniform(size=1021) > 0.1)
    K = 3
    scans = jnp.asarray(rng.normal(size=(K, 512, 3)).astype(np.float32) * 25)
    smask = jnp.ones((K, 512), bool)
    pose_inv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))

    ref = sweep_discrepancy(mp, mmask, scans, smask, pose_inv, fov, shape, 0.1, False)
    out = sweep_discrepancy_map_sharded(mesh, mp, mmask, scans, smask, pose_inv, fov, shape, 0.1, False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_icp_batch_sharded_matches(rng, mesh):
    from ltm.core import se3
    from ltm.dist import icp_batch_sharded
    from ltm.register import icp_batch

    B, NS, NT = 6, 256, 1024   # B not divisible by 8
    base = rng.normal(size=(NT, 3)).astype(np.float32) * np.array([10, 10, 2], np.float32)
    srcs, tgts = [], []
    for b in range(B):
        T = np.asarray(se3.from_rpy(0, 0, 0.05 * b, t=[0.1 * b, -0.1, 0]))
        srcs.append(base[:NS] @ T[:3, :3].T + T[:3, 3])
        tgts.append(base)
    src = jnp.asarray(np.stack(srcs))
    tgt = jnp.asarray(np.stack(tgts))
    sm = jnp.ones((B, NS), bool)
    tm = jnp.ones((B, NT), bool)
    ref = icp_batch(src, sm, tgt, tm, max_iterations=30, tile=512)
    out = icp_batch_sharded(mesh, src, sm, tgt, tm, max_iterations=30, tile=512)
    np.testing.assert_allclose(np.asarray(out.transform), np.asarray(ref.transform), atol=1e-4)
    # fitness sits at the convergence noise floor (~1e-5); different batch
    # shapes vectorize reductions differently -> tiny f32 order differences
    np.testing.assert_allclose(np.asarray(out.fitness), np.asarray(ref.fitness), rtol=1e-3, atol=1e-4)
