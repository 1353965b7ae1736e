import numpy as np
import pytest

from ltm.io import (
    read_g2o, write_g2o, G2oGraph,
    read_pcd, write_pcd, read_kitti_bin, write_kitti_bin,
    read_kitti_poses, write_kitti_poses,
    read_scd, write_scd,
    load_session_dir, write_session_dir,
)
from ltm.io.synthetic import make_two_sessions, make_world, make_session


def random_pose(rng):
    from ltm.io.g2o import _quat_xyzw_to_mat

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    T = np.eye(4)
    T[:3, :3] = _quat_xyzw_to_mat(q)
    T[:3, 3] = rng.normal(size=3) * 10
    return T


def test_g2o_roundtrip(tmp_path, rng):
    g = G2oGraph()
    for i in range(5):
        g.node_ids.append(i)
        g.node_poses.append(random_pose(rng))
    for i in range(4):
        g.edge_from.append(i)
        g.edge_to.append(i + 1)
        g.edge_rel.append(random_pose(rng))
    p = str(tmp_path / "graph.g2o")
    write_g2o(p, g)
    g2 = read_g2o(p)
    assert g2.node_ids == g.node_ids
    np.testing.assert_allclose(g2.poses_array(), np.stack(g.node_poses), atol=1e-12)
    ef, et, er = g2.edges_arrays()
    np.testing.assert_allclose(er, np.stack(g.edge_rel), atol=1e-12)


def test_pcd_binary_ascii_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    pb = str(tmp_path / "b.pcd")
    pa = str(tmp_path / "a.pcd")
    write_pcd(pb, pts, binary=True)
    write_pcd(pa, pts, binary=False)
    np.testing.assert_allclose(read_pcd(pb), pts, atol=0)
    np.testing.assert_allclose(read_pcd(pa), pts, rtol=1e-6)


def test_kitti_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    write_kitti_bin(p, pts)
    np.testing.assert_allclose(read_kitti_bin(p), pts)


def test_kitti_poses_roundtrip(tmp_path, rng):
    poses = np.stack([random_pose(rng) for _ in range(7)])
    p = str(tmp_path / "poses.txt")
    write_kitti_poses(p, poses)
    np.testing.assert_allclose(read_kitti_poses(p), poses, atol=1e-15)


def test_scd_roundtrip(tmp_path, rng):
    desc = np.round(rng.uniform(0, 5, size=(20, 60)), 3)
    p = str(tmp_path / "000000.scd")
    write_scd(p, desc)
    np.testing.assert_allclose(read_scd(p), desc, atol=1e-9)


def test_session_dir_roundtrip(tmp_path):
    bundle = make_two_sessions(num_keyframes=8, max_scan_points=500)
    sess = bundle["central"].data
    sess.descriptors = np.random.default_rng(0).uniform(0, 3, size=(8, 20, 60)).astype(np.float32)
    d = str(tmp_path / "01")
    write_session_dir(d, sess)
    loaded = load_session_dir(d)
    assert loaded.num_nodes == 8
    assert len(loaded.scans) == 8
    np.testing.assert_allclose(loaded.poses, sess.poses, atol=1e-9)
    np.testing.assert_allclose(loaded.scans[3], sess.scans[3], atol=1e-6)
    np.testing.assert_allclose(loaded.descriptors, sess.descriptors, atol=2e-3)
    ef, et, er = loaded.edges
    ef0, et0, er0 = sess.edges
    np.testing.assert_array_equal(ef, ef0)
    np.testing.assert_allclose(er, er0, atol=1e-9)


def test_synthetic_ground_truth_consistency():
    bundle = make_two_sessions(num_keyframes=12, max_scan_points=2000)
    q = bundle["query"]
    # anchor ∘ local == site pose
    site = np.einsum("ij,kjl->kil", q.anchor, np.linalg.inv(q.anchor)[None] @ q.site_poses)
    np.testing.assert_allclose(site, q.site_poses, atol=1e-9)
    # scans reproject near the world points: check a ground point z ~ -2 in local frame
    scan0 = q.data.scans[0]
    assert scan0.shape[1] == 4
    assert np.percentile(scan0[:, 2], 10) < -1.5  # ground below sensor
    # labels: mover labels present
    assert (q.scan_labels[0] >= 1000).any()
    # odometry edges consistent: composing edges from node0 approx reaches node k
    ef, et, er = q.data.edges
    T = q.data.poses[0].copy()
    for k in range(1, 5):
        T = T @ er[k - 1]
    np.testing.assert_allclose(T, q.data.poses[4], atol=1e-6)


def test_truncation_drops_out_of_range_edges(tmp_path):
    """Edges past max_nodes must not survive truncation (they would address
    other sessions' variables in the joint graph)."""
    from ltm.io.g2o import G2oGraph, write_g2o

    g = G2oGraph()
    for i in range(10):
        g.node_ids.append(i)
        g.node_poses.append(np.eye(4))
    for i in range(9):
        g.edge_from.append(i)
        g.edge_to.append(i + 1)
        g.edge_rel.append(np.eye(4))
    d = tmp_path / "s"
    d.mkdir()
    (d / "Scans").mkdir()
    write_g2o(str(d / "singlesession_posegraph.g2o"), g)
    sess = load_session_dir(str(d), load_scans=False, load_scds=False, max_nodes=5)
    assert sess.num_nodes == 5
    ef, et, _ = sess.edges
    assert len(ef) == 4
    assert (ef < 5).all() and (et < 5).all()


def test_removert_input_numeric_name_sort(tmp_path, rng):
    """1.pcd, 2.pcd, ..., 10.pcd must pair with pose lines 0..9 in order."""
    from ltm.io.pcd import write_pcd
    from ltm.io.poses import write_kitti_poses
    from ltm.removert.session import RemovertInput

    d = tmp_path / "scans"
    d.mkdir()
    poses = np.tile(np.eye(4), (11, 1, 1))
    for i in range(11):
        # scan i carries its index in the x coordinate
        write_pcd(str(d / f"{i}.pcd"), np.full((4, 4), float(i), np.float32))
        poses[i, 0, 3] = i
    write_kitti_poses(str(tmp_path / "poses.txt"), poses)
    inp = RemovertInput.from_dirs(str(d), str(tmp_path / "poses.txt"))
    for i in range(11):
        assert inp.scans[i][0, 0] == float(i), (i, inp.names[i])
        assert inp.poses[i][0, 3] == float(i)
