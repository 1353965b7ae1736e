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

    # two-session anchored graph (the real LT-SLAM shape: [anchors, chains]
    # + anchored inter-session loops) so the solve bench exercises every
    # factor family, including the 4-ary anchored gathers of the schur mode
    n_sess = 32 if on_cpu else 500
    V = 2 + 2 * n_sess
    poses0 = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for s in range(2):
        off = 2 + s * n_sess
        poses0[off:off + n_sess, 0, 3] = np.arange(n_sess) + rng.normal(scale=0.05, size=n_sess)
    fixed = np.zeros(V, bool)
    fixed[[0, 2, 2 + n_sess]] = True
    rel = np.eye(4)
    rel[0, 3] = 1.0
    betweens = []
    for s in range(2):
        off = 2 + s * n_sess
        betweens += [(off + i, off + i + 1, rel, (1e-4,) * 6, False)
                     for i in range(n_sess - 1)]
    anchored = [(2 + i, 2 + n_sess + i, 0, 1, np.eye(4), (1e-4,) * 3 + (1e-3,) * 3)
                for i in range(0, n_sess, 2)]
    priors = [(1, np.eye(4), (np.pi ** 2,) * 3 + (1e8,) * 3)]
    g = build_graph_data(poses0, fixed, priors=priors, betweens=betweens,
                         anchored=anchored)
    scfg = SolverConfig(max_outer_iterations=5, cg_iterations=50)

    import dataclasses

    base = {}
    for c in counts:
        mesh = make_mesh(devices[:c])
        dt_sweep = bench(lambda: sweep_discrepancy_sharded(
            mesh, map_xyz, map_mask, scans, smask, pose_inv, fov, shape))
        dt_knn = bench(lambda: knn_avg_sqdist_sharded(mesh, q, jnp.ones(nq, bool), t, jnp.ones(nt, bool)))
        rows = [
            ("sweep", dt_sweep, K, "keyframes/s"),
            ("knn", dt_knn, nq, "queries/s"),
        ]
        for mode in ("schur", "allreduce"):
            mcfg = dataclasses.replace(scfg, dist_mode=mode)
            dt = bench(lambda: solve_sharded(g, mesh, mcfg)[0], reps=2)
            rows.append((f"solve_{mode}", dt, scfg.max_outer_iterations, "lm_iters/s"))
        for name, dt, unit_n, unit in rows:
            rate = unit_n / dt
            base.setdefault(name, rate)
            print(json.dumps({
                "kernel": name, "n_devices": c, "rate": round(rate, 1), "unit": unit,
                "efficiency_vs_1dev": round(rate / base[name] / c, 3),
            }))

    # collective complexity per LM step (the schur mode's point): count
    # collective ops in the compiled HLO, split into inside-CG-loop
    # (executed per CG iteration) vs one-shot per step
    from ltm.dist.solver import _sharded_fns, pad_graph_for_mesh

    mesh = make_mesh(devices)
    gp = pad_graph_for_mesh(g, len(devices))
    for mode in ("schur", "allreduce"):
        step, _cost = _sharded_fns(mesh, scfg.cg_iterations, "tridiag", mode)
        hlo = step.lower(gp, gp.poses0, jnp.float32(1e-4), jnp.float32(1.0),
                         jnp.float32(1e-2), jnp.float32(10.0), jnp.float32(0.3),
                         jnp.float32(1.0)).compile().as_text()
        import re

        def while_bodies(text):
            for m in re.finditer(r"body=%?([\w\.\-]+)", text):
                s = text.find(f"%{m.group(1)} ")
                if s >= 0:
                    yield text[s:text.find("\n}", s)]

        names = ("all-reduce", "all-gather", "collective-permute")
        in_loop = sum(b.count(n) for b in while_bodies(hlo) for n in names)
        total = sum(hlo.count(n) for n in names)
        print(json.dumps({
            "kernel": f"solve_{mode}", "collectives_in_cg_loop": in_loop,
            "collectives_per_step_one_shot": total - in_loop,
            "note": "in-loop ops execute once per CG iteration (<=%d)" % scfg.cg_iterations,
        }))


if __name__ == "__main__":
    main()
