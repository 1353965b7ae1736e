"""Benchmark: keyframes/s of the map→range-image visibility check.

The reference's only in-repo throughput number: map2RangeImg is
"empirically more than 10 Hz" for maps ≤5M points on 16 OpenMP threads
(``ltremovert/src/Removerter.cpp:620-623``).  This benchmark runs the
equivalent (and strictly larger) per-keyframe unit of work — scan range
image + map transform + map range image + winner test + discrepancy — on a
5M-point map and reports keyframes/s; ``vs_baseline`` is the speedup over
the reference's 10 keyframes/s hint.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ltm.kernels.projection import rimg_shape, sweep_discrepancy

    fov = (50.0, 360.0)
    shape = rimg_shape(fov, 2.5)  # (125, 900), the reference operating point

    n_map = 5_000_000
    n_scan = 65_536
    k_frames = 32

    rng = np.random.default_rng(0)
    # plausible lidar geometry: points spread over a 200 m disc with structure
    pts = rng.normal(size=(n_map, 3)).astype(np.float32) * np.array([60, 60, 4], np.float32)
    map_xyz = jnp.asarray(pts)
    map_mask = jnp.ones((n_map,), bool)
    scans = jnp.asarray(rng.normal(size=(k_frames, n_scan, 3)).astype(np.float32)
                        * np.array([40, 40, 3], np.float32))
    smask = jnp.ones((k_frames, n_scan), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (k_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(-30, 30, k_frames)
    pose_inv = jnp.asarray(np.linalg.inv(poses))

    def run():
        return sweep_discrepancy(
            map_xyz, map_mask, scans, smask, pose_inv, fov, shape, 0.1, False
        )

    # compile + warmup
    run().block_until_ready()

    n_reps = 5
    t0 = time.perf_counter()
    for _ in range(n_reps):
        run().block_until_ready()
    dt = (time.perf_counter() - t0) / n_reps

    kf_per_s = k_frames / dt
    print(json.dumps({
        "metric": "removert_visibility_keyframes_per_s_5M_map",
        "value": round(kf_per_s, 2),
        "unit": "keyframes/s",
        "vs_baseline": round(kf_per_s / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
