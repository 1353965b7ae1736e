"""End-to-end Removert pipeline throughput at production scale (real TPU).

BASELINE.json's north-star metric is keyframes/s of the FULL pipeline, not
a single kernel.  This generates a two-session synthetic survey directly as
arrays (no disk I/O — that is benchmarked separately by the native I/O
layer), runs ``Removerter.run`` without artifact saving, and reports
keyframes/s plus the per-stage breakdown that the pipeline's stage timers
log.

Usage: python -m tools.e2e_bench [n_keyframes pts_per_scan]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def synth_session(rng, n_kf, n_pts, traj=1200.0, lateral=45.0, phase=0.0,
                  clusters=None, clutter_frac=0.15):
    """Scans along a corridor: ground + walls + clutter in the LOCAL frame of
    each pose, plus per-session parked 'cars' so change detection has work.

    ``clusters``: optional (M, 3) array of session-specific object centers —
    car-sized point clusters added to every scan that sees them (the
    small-delta workload: two sessions share the corridor geometry and
    differ only in these objects)."""
    xs = np.linspace(60.0, traj - 60.0, n_kf)
    poses = np.tile(np.eye(4, dtype=np.float64), (n_kf, 1, 1))
    poses[:, 0, 3] = xs
    poses[:, 1, 3] = 4.0 * np.sin(xs / 90.0 + phase)

    scans = []
    for k in range(n_kf):
        # default mix (0.55/0.30/0.15) is bit-identical to the round-1/2
        # workload; clutter_frac only redistributes the clutter share
        nc = int(n_pts * clutter_frac)
        ng = int(n_pts * 0.55)
        nw = n_pts - nc - ng
        g = np.stack([rng.uniform(-60, 60, ng), rng.uniform(-lateral, lateral, ng),
                      rng.normal(-1.6, 0.03, ng)], 1)
        side = rng.choice([-lateral, lateral], nw)
        w = np.stack([rng.uniform(-60, 60, nw), side + rng.normal(0, 0.05, nw),
                      rng.uniform(-1.5, 6.0, nw)], 1)
        c = np.stack([rng.uniform(-55, 55, nc), rng.uniform(-lateral, lateral, nc),
                      rng.uniform(-1.5, 2.0, nc)], 1)
        pts = np.concatenate([g, w, c]).astype(np.float32)
        if clusters is not None:
            T = poses[k]
            near = clusters[np.abs(clusters[:, 0] - T[0, 3]) < 55.0]
            for ctr in near:
                obj = ctr[None] - T[:3, 3] + np.stack(
                    [rng.uniform(-2.2, 2.2, 600), rng.uniform(-0.9, 0.9, 600),
                     rng.uniform(0.0, 1.6, 600)], 1)
                pts = np.concatenate([pts, obj.astype(np.float32)])
        scans.append(pts)
    return scans, poses


def make_cluster_centers(rng, n, traj=1200.0, lateral=45.0):
    return np.stack([rng.uniform(80, traj - 80, n),
                     rng.uniform(-lateral + 5, lateral - 5, n),
                     np.full(n, -1.6)], 1)


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter
    from ltm.removert.session import RemovertInput

    small_delta = "--small-delta" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_kf = int(args[0]) if len(args) > 0 else 48
    n_pts = int(args[1]) if len(args) > 1 else 120_000
    rng = np.random.default_rng(0)

    if small_delta:
        # realistic small-delta survey shape (VERDICT r2 #8): both sessions
        # observe the SAME static world and differ only in ~25 car-sized
        # clusters each, so the ND/PD candidate sets are a few % of the map
        # (the strong-weak delta re-blocking's intended shape).  The base
        # scans are SHARED between the sessions: at this workload's sampling
        # budget (scan_capacity subsample ≈ 0.5 m ground spacing), two
        # independent resamplings of a surface cannot match under the kNN
        # radius, which reads ~3/4 of the map as change regardless of
        # clutter — identical base observations model a repeat survey of
        # unchanged structure instead
        base_scans, c_poses = synth_session(rng, n_kf, n_pts, phase=0.0,
                                            clutter_frac=0.0)
        q_poses = c_poses
        c_clu = make_cluster_centers(np.random.default_rng(7), 25)
        q_clu = make_cluster_centers(np.random.default_rng(8), 25)

        def with_clusters(scans, poses, clusters, seed):
            crng = np.random.default_rng(seed)
            out = []
            for k, pts in enumerate(scans):
                T = poses[k]
                near = clusters[np.abs(clusters[:, 0] - T[0, 3]) < 55.0]
                objs = [ctr[None] - T[:3, 3] + np.stack(
                    [crng.uniform(-2.2, 2.2, 600), crng.uniform(-0.9, 0.9, 600),
                     crng.uniform(0.0, 1.6, 600)], 1) for ctr in near]
                out.append(np.concatenate([pts] + objs).astype(np.float32)
                           if objs else pts)
            return out

        c_scans = with_clusters(base_scans, c_poses, c_clu, 17)
        q_scans = with_clusters(base_scans, q_poses, q_clu, 18)
    else:
        c_scans, c_poses = synth_session(rng, n_kf, n_pts, phase=0.0)
        q_scans, q_poses = synth_session(rng, n_kf, n_pts, phase=0.25)
    central = RemovertInput(scans=c_scans, poses=c_poses)
    query = RemovertInput(scans=q_scans, poses=q_poses)

    cfg = RemovertConfig()
    cfg.downsample_voxel_size = 0.1  # production density at this synthetic scale
    if small_delta:
        # scale the kNN static-sensitivity with the voxel (the reference ties
        # 0.01 m² to 0.05 m voxels): at 0.1 m voxels, two independent
        # resamplings of the same surface differ by ~2 voxel-centroid shifts,
        # and the unscaled threshold reads ~60% of the map as change —
        # defeating the small-delta purpose of this mode
        cfg.knn_avg_sqdist_threshold = 0.04
        # no scan subsampling: the capacity stride depends on scan LENGTH
        # (clusters differ per session), so capped sessions would keep
        # nearly disjoint base subsets and everything reads as change again
        cfg.scan_capacity = 1 << 16
    rm = Removerter(cfg)

    # cold run = compiles + steady state; warm run = the production number
    # (a survey processes hundreds of keyframe batches against one cached
    # jit program set — and the CLI persists the XLA compilation cache)
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        result = rm.run(central, query, save_directory=None)
        jax.block_until_ready(result.masks["updated"])
        dt = time.perf_counter() - t0
        total_kf = result.central.num_keyframes + result.query.num_keyframes
        n_map = int(np.asarray(result.central.map_mask).sum()) + int(
            np.asarray(result.query.map_mask).sum())
        print(f"\n[{label}] maps: {n_map} pts total | keyframes: {total_kf} | "
              f"wall: {dt:.1f} s | {total_kf / dt:.2f} keyframes/s (full pipeline)")


if __name__ == "__main__":
    main()
