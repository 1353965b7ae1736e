"""Scaling benchmark: sharded kernels across 1..N devices.

Measures keyframes/s (visibility sweep), queries/s (kNN), and solver
iterations/s for the mesh-sharded paths at increasing device counts, and
reports scaling efficiency vs the 1-device run (BASELINE.json north star:
≥70% at N≥2 hosts).

On a real pod slice this measures ICI scaling; on a dev box run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_bench.py
it validates the machinery on virtual devices (numbers are not hardware-
meaningful there, but the sharding/collective paths are the real ones).

Prints one JSON line per (kernel, n_devices).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x if not isinstance(x, tuple) else x[0]))


def bench(fn, reps=3):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(fn())
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from ltm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ltm.core.config import SolverConfig
    from ltm.dist import (
        knn_avg_sqdist_sharded,
        make_mesh,
        solve_sharded,
        sweep_discrepancy_sharded,
    )
    from ltm.graph import build_graph_data

    devices = jax.devices()
    counts = sorted({1, 2, len(devices) // 2, len(devices)} - {0})
    counts = [c for c in counts if c <= len(devices)]
    rng = np.random.default_rng(0)

    on_cpu = jax.default_backend() == "cpu"
    # CPU smoke sizes keep the virtual-mesh validation under a minute; real
    # accelerators get production shapes
    fov = (50.0, 360.0)
    shape = (25, 180) if on_cpu else (125, 900)
    n_map, n_scan = (1 << 16, 1 << 12) if on_cpu else (1 << 20, 1 << 15)
    K = 16 if on_cpu else 32
    map_xyz = jnp.asarray(rng.normal(size=(n_map, 3)).astype(np.float32) * 40)
    map_mask = jnp.ones((n_map,), bool)
    scans = jnp.asarray(rng.normal(size=(K, n_scan, 3)).astype(np.float32) * 40)
    smask = jnp.ones((K, n_scan), bool)
    pose_inv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))

    nq, nt = (1 << 13, 1 << 14) if on_cpu else (1 << 17, 1 << 18)
    q = jnp.asarray(rng.normal(size=(nq, 3)).astype(np.float32) * 30)
    t = jnp.asarray(rng.normal(size=(nt, 3)).astype(np.float32) * 30)

    n_nodes = 64 if on_cpu else 256
    poses0 = np.tile(np.eye(4, dtype=np.float32), (n_nodes, 1, 1))
    poses0[:, 0, 3] = np.arange(n_nodes) + rng.normal(scale=0.05, size=n_nodes)
    fixed = np.zeros(n_nodes, bool)
    fixed[0] = True
    rel = np.eye(4)
    rel[0, 3] = 1.0
    betweens = [(i, i + 1, rel, (1e-4,) * 6, False) for i in range(n_nodes - 1)]
    g = build_graph_data(poses0, fixed, betweens=betweens)
    scfg = SolverConfig(max_outer_iterations=5, cg_iterations=50)

    base = {}
    for c in counts:
        mesh = make_mesh(devices[:c])
        dt_sweep = bench(lambda: sweep_discrepancy_sharded(
            mesh, map_xyz, map_mask, scans, smask, pose_inv, fov, shape))
        dt_knn = bench(lambda: knn_avg_sqdist_sharded(mesh, q, jnp.ones(nq, bool), t, jnp.ones(nt, bool)))
        dt_solve = bench(lambda: solve_sharded(g, mesh, scfg)[0], reps=2)
        for name, dt, unit_n, unit in (
            ("sweep", dt_sweep, K, "keyframes/s"),
            ("knn", dt_knn, nq, "queries/s"),
            ("solve", dt_solve, scfg.max_outer_iterations, "lm_iters/s"),
        ):
            rate = unit_n / dt
            base.setdefault(name, rate)
            print(json.dumps({
                "kernel": name, "n_devices": c, "rate": round(rate, 1), "unit": unit,
                "efficiency_vs_1dev": round(rate / base[name] / c, 3),
            }))


if __name__ == "__main__":
    main()
