"""Per-iteration LM diagnostics on the bench-shaped slam graph: cost, lambda,
CG residual, accept, and per-step wall — to see why the early exit doesn't
fire within 30 iterations."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from ltm.core.config import LTSlamConfig
from ltm.graph.solver import _cost_jit, _lm_step_jit
from ltm.io.synthetic import make_two_sessions
from ltm.slam.pipeline import LTSlam


def main():
    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    bundle = make_two_sessions(seed=11, num_keyframes=n_kf, num_cars=12,
                               num_changed=4, max_scan_points=8000,
                               scan_range=70.0, odom_noise=5e-4)
    cfg = LTSlamConfig()
    slam = LTSlam(cfg)
    from ltm.slam.session import SlamSession, auto_scan_capacity

    data = [bundle["central"].data, bundle["query"].data]
    n_cap = 1 << max(3, (max(d.num_nodes for d in data) - 1).bit_length())
    slam.nodes_cap = n_cap
    s_cap = auto_scan_capacity(data)
    slam.sessions = [SlamSession.from_session_data(d, cfg, is_base=(i == 0),
                                                   n_cap=n_cap, s_cap=s_cap)
                     for i, d in enumerate(data)]
    slam.n_sessions = 2
    slam._init_graph()
    g = slam._build_graph()

    scfg = cfg.solver
    poses = jnp.asarray(g.poses0)
    lam = jnp.asarray(scfg.lambda_init, poses.dtype)
    cost = _cost_jit(g, poses, scfg.cauchy_k)
    print(f"initial cost {float(cost):.6g}  cg_iters={scfg.cg_iterations} "
          f"cg_tol={scfg.cg_tol}")
    prev = float(cost)
    for it in range(1, scfg.max_outer_iterations + 1):
        t0 = time.perf_counter()
        poses, lam, cost, done, res = _lm_step_jit(
            g, poses, lam, cost, scfg.cg_iterations, scfg.cg_tol,
            scfg.lambda_up, scfg.lambda_down, scfg.cauchy_k)
        c = float(cost)
        dt = time.perf_counter() - t0
        print(f"it{it:3d} cost={c:.6g} rel_impr={(prev - c) / max(prev, 1e-20):.3e} "
              f"lam={float(lam):.2e} cg_res={float(res):.2e} "
              f"done={bool(done)} wall={dt:.3f}s")
        prev = c
        if bool(done):
            break


if __name__ == "__main__":
    main()
