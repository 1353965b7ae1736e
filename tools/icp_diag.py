"""Diagnose ICP convergence on bench-shaped pairs: capture real pair data
from a small LTSlam run, then re-run the ICP iteration as a host loop
printing per-iteration criterion quantities (delta rotation cos, step
translation, MSE change, correspondence flips)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ltm.core import se3
from ltm.core.config import LTSlamConfig
from ltm.io.synthetic import make_two_sessions
from ltm.slam.pipeline import LTSlam
from ltm.kernels.knn import nn_sqdist_argmin
from ltm.register.icp import _umeyama_rigid

captured = {}


def main():
    bundle = make_two_sessions(seed=11, num_keyframes=60, num_cars=12,
                               num_changed=4, max_scan_points=8000,
                               scan_range=70.0, odom_noise=5e-4)
    cfg = LTSlamConfig()
    slam = LTSlam(cfg)

    orig = LTSlam._run_icp_batches

    def spy(self, pair_data, init_transforms, chunk=8):
        if "pairs" not in captured:
            captured["pairs"] = pair_data
            captured["inits"] = init_transforms
        return orig(self, pair_data, init_transforms, chunk)

    LTSlam._run_icp_batches = spy
    slam.run(bundle["central"].data, bundle["query"].data, save_directory=None)
    LTSlam._run_icp_batches = orig

    pairs = captured["pairs"]
    inits = captured["inits"]
    print(f"captured {len(pairs)} pairs")

    @jax.jit
    def step(T, src, sm, tgt, tm):
        moved = se3.transform_points(T, src)
        d2, idx = nn_sqdist_argmin(moved, sm, tgt, tm, tile=4096)
        w = (sm & (d2 <= 150.0 ** 2)).astype(src.dtype)
        dst = tgt[idx]
        delta = _umeyama_rigid(moved, dst, w)
        T_new = se3.compose(delta, T)
        mse = jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), 1.0)
        cos_angle = 0.5 * (delta[0, 0] + delta[1, 1] + delta[2, 2] - 1.0)
        trans_sqr = jnp.sum(delta[:3, 3] ** 2)
        return T_new, idx, mse, cos_angle, trans_sqr

    for p in range(0, min(len(pairs), 4)):
        src, sm, tgt, tm = pairs[p]
        T = jnp.asarray(inits[p], jnp.float32)
        print(f"--- pair {p}: src_valid={int(np.asarray(sm).sum())} "
              f"tgt_valid={int(np.asarray(tm).sum())}")
        prev_idx = None
        prev_mse = np.inf
        for it in range(40):
            T, idx, mse, ca, ts = step(T, src, sm, tgt, tm)
            idx = np.asarray(idx)
            flips = int((idx != prev_idx).sum()) if prev_idx is not None else -1
            prev_idx = idx
            mse = float(mse)
            if it < 12 or it % 5 == 0:
                print(f"  it{it:3d} 1-cos={1.0 - float(ca):.3e} "
                      f"t_sq={float(ts):.3e} mse={mse:.5f} "
                      f"dmse={abs(mse - prev_mse):.3e} flips={flips}")
            prev_mse = mse


if __name__ == "__main__":
    main()
