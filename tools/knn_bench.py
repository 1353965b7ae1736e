"""Compare kNN paths at pipeline scale on realistic surface geometry (TPU).

Measures ``Removerter._knn_stat`` end-to-end (block-map build + chunked
kernel + overflow brute-force fallback) against the brute-force path, and
checks that every pipeline threshold decision agrees.

Usage: python -m tools.knn_bench [n_targets n_queries]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def surface_map(rng, n, traj=2000.0):
    """60% ground plane, 30% walls at y=+-50, 10% clutter — the bounded-
    support, near-uniform-density shape of a voxel-downsampled LiDAR map."""
    ng, nw = int(n * 0.6), int(n * 0.3)
    nc = n - ng - nw
    g = np.stack([rng.uniform(0, traj, ng), rng.uniform(-50, 50, ng),
                  rng.normal(0, 0.05, ng)], 1)
    side = rng.choice([-50.0, 50.0], nw)
    w = np.stack([rng.uniform(0, traj, nw), side + rng.normal(0, 0.05, nw),
                  rng.uniform(0, 10, nw)], 1)
    c = np.stack([rng.uniform(0, traj, nc) + rng.normal(0, 1, nc),
                  rng.uniform(-45, 45, nc) + rng.normal(0, 1, nc),
                  rng.uniform(0, 3, nc)], 1)
    return np.concatenate([g, w, c]).astype(np.float32)


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from ltm.core.config import RemovertConfig
    from ltm.removert.pipeline import Removerter

    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    rng = np.random.default_rng(0)
    t = jnp.asarray(surface_map(rng, nt))
    tm = jnp.ones((nt,), bool)
    q = jnp.asarray(surface_map(rng, nq)
                    + rng.normal(scale=0.1, size=(nq, 3)).astype(np.float32))
    qm = jnp.ones((nq,), bool)

    cfg = RemovertConfig()
    rm = Removerter(cfg)

    cfg.use_chunk_knn = True
    dt_c, d_chunk = timeit(lambda: rm._knn_stat(q, qm, t, tm))
    print(f"chunk path (incl. build+fallback): {dt_c*1e3:9.1f} ms")

    cfg.use_chunk_knn = False
    dt_b, d_brute = timeit(lambda: rm._knn_stat(q, qm, t, tm))
    print(f"brute path:                        {dt_b*1e3:9.1f} ms")

    db = np.asarray(d_brute)
    dc = np.asarray(d_chunk)
    ok = True
    for thres in (cfg.knn_avg_sqdist_threshold, 0.04, cfg.weak_to_strong_sqdist_threshold):
        same = np.mean((dc < thres) == (db < thres))
        ok &= same == 1.0
        print(f"  decision agreement @ {thres}: {same:.6f}")
    print(f"speedup: {dt_b/dt_c:.2f}x  decisions {'EXACT' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
