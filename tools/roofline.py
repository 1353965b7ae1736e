"""Per-stage roofline table for the full Removerter pipeline (VERDICT r3 #3).

Runs the bench.py pipeline workload warm with true stage attribution
(LTM_SYNC_STAGES=1 — stage boundaries use the in-order one-round-trip
barrier, see utils/logging._drain_devices), collects the EXACT map-slot
touch counts the sweep stages record (utils.logging.count_slots at every
sweep call site), calibrates the achievable ns/slot on this chip with an
isolated reference sweep, and prints wall vs ceiling per stage.

"Slot" = one element of a (k_blocks x block_capacity x keyframes) blocked
sweep: the per-slot work is fixed (1 gather of the point + projection math
+ participation in 1 scatter-min + 1 packed winner gather) and
dynamic-index ops serialize at ~6 cycles/element on v5e regardless of
layout (docs/PERF.md "Hardware facts"), so slots x calibrated-ns/slot is
the speed-of-light bound for these stages on this hardware.

Usage: python -m tools.roofline
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ["LTM_SYNC_STAGES"] = "1"


def calibrate_ns_per_slot() -> float:
    """Measured ns/slot of the reference sweep kernel on a bench-shaped
    blocked map (same kernel the HD/filter stages run)."""
    import jax.numpy as jnp

    from ltm.kernels.blocks import build_block_map, block_sweep_discrepancy, required_k_blocks
    from ltm.kernels.projection import rimg_shape

    fov = (50.0, 360.0)
    shape = rimg_shape(fov, 2.5)
    rng = np.random.default_rng(0)
    n_map, n_scan, k_frames = 2_000_000, 16_384, 16
    along = rng.uniform(0.0, 1000.0, n_map).astype(np.float32)
    lat = (rng.normal(size=n_map) * 30).astype(np.float32)
    z = (rng.normal(size=n_map) * 2).astype(np.float32)
    map_xyz = jnp.asarray(np.stack([along, lat, z], 1))
    raw = rng.normal(size=(k_frames, n_scan, 3)).astype(np.float32) * np.array([40, 40, 3], np.float32)
    rr = np.linalg.norm(raw, axis=-1, keepdims=True)
    raw = np.where(rr > 120.0, raw * (120.0 / rr), raw)
    scans = jnp.asarray(raw)
    smask = jnp.ones((k_frames, n_scan), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (k_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(100, 900, k_frames)
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)
    bm, ov = build_block_map(map_xyz, jnp.ones((n_map,), bool), 40.0, 8192, 256)
    assert int(ov) == 0
    kb = required_k_blocks(bm, poses[:, :3, 3], 120.2)

    def run():
        out = block_sweep_discrepancy(
            bm, scans, smask, pose_inv, poses_j, fov, shape,
            k_blocks=kb, max_range=120.2, diff_threshold=0.1, reverse=False)
        return int(jnp.sum(out))

    run()
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    slots = kb * 256 * k_frames
    return dt / slots * 1e9


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter
    from ltm.removert.session import RemovertInput
    from ltm.utils import reset_slot_counts, slot_counts
    from ltm.utils.logging import reset_stage_times, stage_times
    from tools.e2e_bench import synth_session

    ns_slot = calibrate_ns_per_slot()
    print(f"calibrated sweep ns/slot on this chip: {ns_slot:.1f}")

    rng = np.random.default_rng(0)
    n_kf, n_pts = 48, 120_000
    c_scans, c_poses = synth_session(rng, n_kf, n_pts, phase=0.0)
    q_scans, q_poses = synth_session(rng, n_kf, n_pts, phase=0.25)
    cfg = RemovertConfig()
    cfg.downsample_voxel_size = 0.1
    rm = Removerter(cfg)
    central = RemovertInput(scans=c_scans, poses=c_poses)
    query = RemovertInput(scans=q_scans, poses=q_poses)

    rm.run(central, query, save_directory=None)     # compile
    reset_slot_counts()
    reset_stage_times()
    t0 = time.perf_counter()
    result = rm.run(central, query, save_directory=None)
    jax.block_until_ready(result.masks["updated"])
    wall = time.perf_counter() - t0
    walls = stage_times()
    slots = slot_counts()
    # the 2-NN weak→strong promotion is kNN work, not sweep-slot work — in
    # sync mode the pipeline runs it as its own sub-stage (in production it
    # interleaves with the PD sweeps); attribute the outer wall without it
    prop = walls.get("removert.strong_weak.propagate", 0.0)
    if prop and "removert.strong_weak" in walls:
        walls["removert.strong_weak"] -= prop

    print(f"\nwarm pipeline wall (synced stages): {wall:.2f} s "
          f"({2 * n_kf / wall:.2f} keyframes/s)")
    print(f"{'stage':<28}{'wall s':>8}{'slots':>14}{'ceiling s':>11}{'wall/ceil':>10}")
    for stage in sorted(walls, key=walls.get, reverse=True):
        w = walls[stage]
        s = slots.get(stage, 0)
        if s:
            ceil = s * ns_slot / 1e9
            print(f"{stage:<28}{w:>8.2f}{s:>14,}{ceil:>11.2f}{w / ceil:>10.2f}")
        else:
            print(f"{stage:<28}{w:>8.2f}{'—':>14}{'—':>11}{'—':>10}")
    print("\nstages without slot counts: prep is host-voxel + transfer bound "
          "(native voxel measured 51 ns/pt on this 2-core host); knn_diff is "
          "the chunked block kNN whose layout sweep plateaus at the same "
          "flagged sets (PERF.md) — its unit of work is candidate distances, "
          "not sweep slots.")


if __name__ == "__main__":
    main()
