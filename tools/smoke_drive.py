"""User-style smoke drive: synthetic two-session dataset on disk -> the
ltremovert CLI end-to-end -> artifact checks.

Exercises the real file protocol (PCD scan dirs + KITTI pose files), the
YAML config path, and the full Removert/LT-map pipeline including the
chunked-kNN dispatch (forced on at smoke scale via the config).

Usage: cd /tmp && timeout 600 python /root/repo/tools/smoke_drive.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb

xb._backend_factories.pop("axon", None)

import numpy as np


def main():
    from ltm.cli.ltremovert import main as removert_main
    from ltm.core.config import RemovertConfig, save_yaml
    from ltm.io.pcd import write_pcd
    from ltm.io.poses import write_kitti_poses
    from ltm.io.synthetic import make_two_sessions

    root = tempfile.mkdtemp(prefix="ltm_smoke_")
    print(f"workdir: {root}")
    data = make_two_sessions(seed=3, num_keyframes=14, num_cars=8,
                             max_scan_points=3000)
    for which in ("central", "query"):
        sess = data[which]
        d = os.path.join(root, which, "Scans")
        os.makedirs(d)
        for i, scan in enumerate(sess.data.scans):
            write_pcd(os.path.join(d, f"{i}.pcd"), scan)
        write_kitti_poses(os.path.join(root, which, "poses.txt"), sess.site_poses)

    cfg = RemovertConfig(
        central_sess_scan_dir=os.path.join(root, "central", "Scans"),
        central_sess_pose_path=os.path.join(root, "central", "poses.txt"),
        query_sess_scan_dir=os.path.join(root, "query", "Scans"),
        query_sess_pose_path=os.path.join(root, "query", "poses.txt"),
        save_pcd_directory=os.path.join(root, "out"),
        chunk_knn_min_targets=0,  # force the chunked-kNN path at smoke scale
    )
    cfg_path = os.path.join(root, "params.yaml")
    save_yaml(cfg, cfg_path)

    rc = removert_main(["--config", cfg_path, "--resume"])
    assert rc == 0, f"CLI exited {rc}"

    out = cfg.save_pcd_directory
    expected = ["updated_map.pcd", "updated_map_strong.pcd", "pd_map.pcd",
                "nd_map.pcd", "strong_pd_map.pcd", "strong_nd_map.pcd"]
    from ltm.io.pcd import read_pcd
    for name in expected:
        p = os.path.join(out, name)
        assert os.path.exists(p), f"missing artifact {name}"
        n = len(read_pcd(p))
        print(f"  {name}: {n} points")
    for d in ("scans_updated", "scans_pd", "scans_nd_strong"):
        p = os.path.join(out, d)
        assert os.path.isdir(p) and os.listdir(p), f"missing scan tree {d}"
        print(f"  {d}/: {len(os.listdir(p))} scans")

    # sanity: the updated map must keep most of the shared world
    n_updated = len(read_pcd(os.path.join(out, "updated_map.pcd")))
    assert n_updated > 10_000, f"updated map suspiciously small: {n_updated}"

    # --resume: unchanged inputs+config must skip the whole stage
    import time

    mtime = os.path.getmtime(os.path.join(out, "updated_map.pcd"))
    t0 = time.perf_counter()
    rc = removert_main(["--config", cfg_path, "--resume"])
    dt = time.perf_counter() - t0
    assert rc == 0, f"resume CLI exited {rc}"
    assert os.path.getmtime(os.path.join(out, "updated_map.pcd")) == mtime, \
        "resume re-ran an unchanged stage"
    assert dt < 10.0, f"resume skip took {dt:.1f}s — stage cache not hit"
    print(f"  --resume skip: {dt:.2f}s, artifacts untouched")
    print("SMOKE DRIVE OK")


if __name__ == "__main__":
    main()
