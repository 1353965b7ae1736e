"""One-off tuner: measure bench.py's sweep across block layouts (exact culling).

Prints keyframes/s per (cell_size, n_blocks, block_capacity) with k_blocks
auto-sized by ``required_k_blocks`` so every config is exact.  Used to pick
the bench.py operating point; not part of the library.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from ltm.kernels.blocks import (
        build_block_map,
        block_sweep_discrepancy,
        required_k_blocks,
    )
    from ltm.kernels.projection import rimg_shape

    fov = (50.0, 360.0)
    shape = rimg_shape(fov, 2.5)

    n_map, n_scan, k_frames, traj_len = 5_000_000, 65_536, 32, 2000.0
    rng = np.random.default_rng(0)
    along = rng.uniform(0.0, traj_len, n_map).astype(np.float32)
    lat = (rng.normal(size=n_map) * 30).astype(np.float32)
    z = (rng.normal(size=n_map) * 2).astype(np.float32)
    map_xyz = jnp.asarray(np.stack([along, lat, z], axis=1))
    map_mask = jnp.ones((n_map,), bool)

    raw = rng.normal(size=(k_frames, n_scan, 3)).astype(np.float32) * np.array([40, 40, 3], np.float32)
    rr = np.linalg.norm(raw, axis=-1, keepdims=True)
    raw = np.where(rr > 120.0, raw * (120.0 / rr), raw)
    scans = jnp.asarray(raw)
    smask = jnp.ones((k_frames, n_scan), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (k_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(100, traj_len - 100, k_frames)
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)

    max_range = 120.0 + 0.1 + 0.1

    configs = [
        (40.0, 20480, 256),
        (30.0, 24576, 224),
        (25.0, 28672, 192),
        (20.0, 45056, 128),
        (15.0, 65536, 96),
    ]
    for cell, nb, cap in configs:
        bm, overflow = build_block_map(map_xyz, map_mask, cell_size=cell,
                                       n_blocks=nb, block_capacity=cap)
        ov = int(overflow)
        if ov:
            print(f"cell={cell:5.1f} nb={nb:6d} cap={cap:4d}  OVERFLOW {ov}")
            continue
        kb = required_k_blocks(bm, poses[:, :3, 3], max_range)
        work = kb * cap

        def run():
            out = block_sweep_discrepancy(
                bm, scans, smask, pose_inv, poses_j, fov, shape,
                k_blocks=kb, max_range=max_range, diff_threshold=0.1,
                reverse=False)
            return int(jnp.sum(out))

        n_dyn = run()  # compile + warm
        t0 = time.perf_counter()
        n2 = run()
        dt = time.perf_counter() - t0
        rate = k_frames / dt
        print(f"cell={cell:5.1f} nb={nb:6d} cap={cap:4d} kb={kb:5d} "
              f"work={work/1e3:7.0f}k pts/frame  {rate:7.1f} kf/s  dyn={n_dyn}=={n2}",
              flush=True)


if __name__ == "__main__":
    main()
