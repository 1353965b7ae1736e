"""Native C++ I/O runtime vs the pure-Python reference implementations."""

import numpy as np
import pytest

from ltm.io import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_pcd_roundtrip_native(tmp_path, rng):
    pts = rng.normal(size=(5000, 4)).astype(np.float32)
    p = str(tmp_path / "n.pcd")
    assert native.write_pcd_native(p, pts, binary=True)
    out = native.read_pcd_native(p)
    np.testing.assert_array_equal(out, pts)


def test_native_reads_python_written(tmp_path, rng):
    from ltm.io import pcd as pcd_py

    pts = rng.normal(size=(777, 4)).astype(np.float32)
    pb = str(tmp_path / "py_bin.pcd")
    pa = str(tmp_path / "py_ascii.pcd")
    # force python writer
    was = native._lib
    native._lib = None
    native._tried = True
    try:
        pcd_py.write_pcd(pb, pts, binary=True)
        pcd_py.write_pcd(pa, pts, binary=False)
    finally:
        native._lib = was
    np.testing.assert_array_equal(native.read_pcd_native(pb), pts)
    np.testing.assert_allclose(native.read_pcd_native(pa), pts, rtol=1e-6)


def test_python_reads_native_written(tmp_path, rng):
    from ltm.io import pcd as pcd_py

    pts = rng.normal(size=(123, 4)).astype(np.float32)
    p = str(tmp_path / "n2.pcd")
    native.write_pcd_native(p, pts, binary=True)
    was = native._lib
    native._lib = None
    try:
        out = pcd_py.read_pcd(p)
    finally:
        native._lib = was
    np.testing.assert_array_equal(out, pts)


def test_kitti_bin_native(tmp_path, rng):
    pts = rng.normal(size=(64, 4)).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts.tofile(p)
    np.testing.assert_array_equal(native.read_kitti_bin_native(p), pts)


def test_poses_native(tmp_path, rng):
    from ltm.io.poses import write_kitti_poses

    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    p = str(tmp_path / "poses.txt")
    write_kitti_poses(p, poses)
    np.testing.assert_allclose(native.read_poses_native(p), poses, atol=1e-12)


def test_voxel_downsample_native(rng):
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    out = native.voxel_downsample_native(pts, 0.25)
    keys = np.floor(pts / 0.25).astype(np.int64)
    n_uniq = len(np.unique(keys, axis=0))
    assert len(out) == n_uniq
    # centroids within voxel bounds
    okeys = np.floor(out / 0.25 + 1e-4).astype(np.int64)
    assert len(np.unique(okeys, axis=0)) == n_uniq
