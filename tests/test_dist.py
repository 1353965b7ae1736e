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

    cfg = SolverConfig(max_outer_iterations=8)
    poses_ref, info_ref = solve(g, cfg)
    poses_sh, info_sh = solve_sharded(g, mesh, cfg)

    err = np.asarray(se3.log(se3.between(poses_ref, poses_sh)))
    assert np.abs(err).max() < 1e-3, np.abs(err).max()
    np.testing.assert_allclose(float(info_sh.cost_final), float(info_ref.cost_final), rtol=0.05, atol=1e-4)


def _two_session_anchored_graph(n=12, seed=3):
    """[anchor0, anchor1, sess-0 chain, sess-1 chain] + anchored loops —
    the real LT-SLAM variable layout (anchors then per-session odometry
    chains), so the test exercises every factor family the schur step
    gathers, including the 4-ary anchored scatter paths."""
    rng = np.random.default_rng(seed)
    t1 = np.asarray(se3.from_rpy(0, 0, 0.2, t=[1.0, 0.5, 0.1]))  # gt anchor 1
    site = []
    for k in range(n):
        site.append(np.asarray(se3.from_rpy(0, 0, 0.02 * k, t=[1.0 * k, 0.1 * k, 0])))
    site = np.stack(site)
    x0 = site                                     # session 0 local frames
    x1 = np.linalg.inv(t1)[None] @ site           # session 1 local frames

    V = 2 + 2 * n
    init = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    gt = np.concatenate([np.stack([np.eye(4), t1]), x0, x1]).astype(np.float32)
    noise = rng.normal(scale=0.03, size=(V, 6)).astype(np.float32)
    init = np.array(se3.retract(jnp.asarray(gt), jnp.asarray(noise)), np.float32)
    init[0] = np.eye(4)          # base anchor
    init[1] = np.eye(4)          # anchor 1 starts at identity (recovered)
    init[2] = gt[2]              # first node of each session gauge-fixed
    init[2 + n] = gt[2 + n]
    fixed = np.zeros(V, bool)
    fixed[[0, 2, 2 + n]] = True

    priors = [(1, np.eye(4), (np.pi ** 2,) * 3 + (1e8,) * 3)]  # large anchor prior
    betweens = []
    for s, x in ((0, x0), (1, x1)):
        off = 2 + s * n
        for k in range(n - 1):
            betweens.append((off + k, off + k + 1,
                             np.linalg.inv(x[k]) @ x[k + 1], (1e-4,) * 6, False))
        # one robust intra-session loop per session
        betweens.append((off, off + n - 1,
                         np.linalg.inv(x[0]) @ x[n - 1], (1e-3,) * 6, True))
    anchored = []
    for k in range(0, n, 2):
        meas = np.linalg.inv(site[k]) @ site[min(k + 1, n - 1)]
        anchored.append((k, min(k + 1, n - 1), 0, 1, meas,
                         (1e-4,) * 3 + (1e-3,) * 3))
        # indices above are session-node offsets; map to variable ids
        i, j, ai, aj, m, s_ = anchored[-1]
        anchored[-1] = (2 + i, 2 + n + j, ai, aj, m, s_)
    return build_graph_data(init, fixed, priors=priors, betweens=betweens,
                            anchored=anchored), jnp.asarray(gt)


@pytest.mark.parametrize("mode", ["schur", "allreduce"])
def test_solve_sharded_anchored_modes_match_single(mesh, mode):
    import dataclasses

    g, gt = _two_session_anchored_graph()
    cfg = dataclasses.replace(SolverConfig(max_outer_iterations=8), dist_mode=mode)
    poses_ref, info_ref = solve(g, cfg)
    poses_sh, info_sh = solve_sharded(g, mesh, cfg)

    err = np.asarray(se3.log(se3.between(poses_ref, poses_sh)))
    assert np.abs(err).max() < 1e-3, np.abs(err).max()
    np.testing.assert_allclose(float(info_sh.cost_final), float(info_ref.cost_final),
                               rtol=0.05, atol=1e-4)
    # the solve must actually recover anchor 1 (non-vacuous: init was I)
    aerr = np.asarray(se3.log(se3.between(poses_sh[1], gt[1])))
    assert np.abs(aerr).max() < 0.05, aerr


def _while_bodies(hlo: str):
    """Yield the HLO text of every while-loop body computation."""
    import re

    for m in re.finditer(r"body=%?([\w\.\-]+)", hlo):
        name = m.group(1)
        start = hlo.find(f"%{name} ")
        if start < 0:
            start = hlo.find(f"{name} ")
        if start < 0:
            continue
        end = hlo.find("\n}", start)
        yield hlo[start:end]


def test_schur_step_has_no_collectives_in_cg_loop(mesh):
    """The point of the schur mode (VERDICT r4 #4): collectives per LM step
    are O(1) — one gather wave of the compact linearized system + one cost
    psum — instead of O(CG iterations).  Verified on the compiled HLO: the
    schur step's while-loop bodies contain NO collective ops, while the
    allreduce step runs all-reduces inside the CG loop."""
    from ltm.dist.solver import _sharded_fns, pad_graph_for_mesh

    g, _ = _two_session_anchored_graph()
    gp = pad_graph_for_mesh(g, 8)
    texts = {}
    for mode in ("schur", "allreduce"):
        step, _cost = _sharded_fns(mesh, 50, "tridiag", mode)
        texts[mode] = step.lower(
            gp, gp.poses0, jnp.float32(1e-4), jnp.float32(1.0),
            jnp.float32(1e-2), jnp.float32(10.0), jnp.float32(0.3),
            jnp.float32(1.0)).compile().as_text()

    def loop_collectives(hlo):
        return sum(body.count("all-reduce") + body.count("all-gather")
                   + body.count("collective-permute")
                   for body in _while_bodies(hlo))

    assert loop_collectives(texts["allreduce"]) > 0   # psum per CG iteration
    assert loop_collectives(texts["schur"]) == 0      # comm-free CG
    # and the schur step still communicates (the one gather wave + psum)
    assert texts["schur"].count("all-gather") + texts["schur"].count("all-reduce") > 0


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
