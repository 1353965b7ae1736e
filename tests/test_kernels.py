import jax.numpy as jnp
import numpy as np

from ltm.kernels import knn, polar_bin, projection, voxel


# ---------------------------------------------------------------- projection

def ref_pixel(xyz, fov, shape):
    """NumPy re-derivation of the reference pixel formula (oracle)."""
    vfov, hfov = fov
    nrow, ncol = shape
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    az = np.degrees(np.arctan2(y, x))
    el = np.degrees(np.arctan2(z, np.hypot(x, y)))
    row = np.clip(np.round(nrow * (1 - (el + vfov / 2) / vfov)), 0, nrow - 1).astype(int)
    col = np.clip(np.round(ncol * ((az + hfov / 2) / hfov)), 0, ncol - 1).astype(int)
    return row, col, np.linalg.norm(xyz, axis=1)


def test_spherical_project_matches_oracle(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 20
    fov, shape = (50.0, 360.0), (50, 360)
    pix, r = projection.spherical_project(jnp.asarray(pts), fov, shape)
    row, col, rr = ref_pixel(pts, fov, shape)
    np.testing.assert_array_equal(np.asarray(pix), row * shape[1] + col)
    np.testing.assert_allclose(np.asarray(r), rr, rtol=1e-5)


def test_range_image_scatter_min(rng):
    fov, shape = (50.0, 360.0), (25, 180)
    pts = rng.normal(size=(2000, 3)).astype(np.float32) * 30
    mask = np.ones(2000, bool)
    mask[::7] = False
    img = np.asarray(projection.range_image(jnp.asarray(pts), jnp.asarray(mask), fov, shape))
    row, col, r = ref_pixel(pts, fov, shape)
    ref = np.full(shape[0] * shape[1], projection.NO_POINT, np.float32)
    for i in np.flatnonzero(mask):
        p = row[i] * shape[1] + col[i]
        ref[p] = min(ref[p], r[i])
    np.testing.assert_allclose(img, ref, rtol=1e-6)


def test_discrepancy_dynamic_detection():
    """A point in front of a wall (map has it, scan sees through) is dynamic."""
    fov, shape = (50.0, 360.0), (50, 360)
    # scan: wall at 20 m in +x
    scan = np.array([[20.0, 0.0, 0.0]], np.float32)
    # map: same wall + a ghost point at 10 m (same pixel, nearer)
    mp = np.array([[20.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 15.0, 0.0]], np.float32)
    dyn = projection.discrepancy_mask(
        jnp.asarray(mp), jnp.ones(3, bool), jnp.asarray(scan), jnp.ones(1, bool),
        fov, shape, 0.1, False,
    )
    # ghost dynamic; wall static (diff 0); side point: scan pixel empty -> diff<0
    np.testing.assert_array_equal(np.asarray(dyn), [False, True, False])
    # reversed diff flags nothing here (map never farther than scan)
    dyn_r = projection.discrepancy_mask(
        jnp.asarray(mp), jnp.ones(3, bool), jnp.asarray(scan), jnp.ones(1, bool),
        fov, shape, 0.1, True,
    )
    assert not np.asarray(dyn_r).any()


def test_winner_occlusion():
    fov, shape = (50.0, 360.0), (50, 360)
    mp = jnp.asarray(np.array([[10.0, 0, 0], [20.0, 0, 0]], np.float32))
    win, *_ = projection.winner_mask(mp, jnp.ones(2, bool), fov, shape)
    np.testing.assert_array_equal(np.asarray(win), [True, False])


def test_sweep_discrepancy_multi_keyframe(rng):
    fov, shape = (50.0, 360.0), (25, 180)
    mp = rng.normal(size=(512, 3)).astype(np.float32) * 25
    mp[:, 2] = np.abs(mp[:, 2]) * 0.1
    scans = np.stack([mp for _ in range(3)]).astype(np.float32)
    pose_inv = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4))
    dyn = projection.sweep_discrepancy(
        jnp.asarray(mp), jnp.ones(512, bool), jnp.asarray(scans), jnp.ones((3, 512), bool),
        jnp.asarray(pose_inv), fov, shape, 0.1, False,
    )
    # map == scan -> nothing dynamic
    assert not np.asarray(dyn).any()
    vis = projection.sweep_visibility(
        jnp.asarray(mp), jnp.ones(512, bool), jnp.asarray(pose_inv), fov, shape
    )
    assert np.asarray(vis).sum() > 0


# --------------------------------------------------------------------- voxel

def test_voxel_centroid_matches_oracle(rng):
    pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[::5] = False
    out_xyz, out_mask, nvox = voxel.voxel_downsample_centroid(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 512
    )
    # oracle
    keys = np.floor(pts[mask] / 0.5).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    cents = np.zeros((len(uniq), 3))
    cnts = np.zeros(len(uniq))
    for i, g in enumerate(inv):
        cents[g] += pts[mask][i]
        cnts[g] += 1
    cents /= cnts[:, None]
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    assert int(nvox) == len(uniq)
    # compare as sets (order differs)
    got_sorted = got[np.lexsort(got.T)]
    ref_sorted = cents[np.lexsort(cents.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)


def test_voxel_centroid_capped_matches_uncapped_when_fitting(rng):
    pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[::7] = False
    a = voxel.voxel_downsample_centroid(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512)
    b = voxel.voxel_downsample_centroid_capped(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512)
    assert int(a[2]) == int(b[2])
    np.testing.assert_allclose(np.asarray(a[0])[np.asarray(a[1])],
                               np.asarray(b[0])[np.asarray(b[1])], atol=1e-6)


def test_voxel_centroid_capped_overflow_uniform(rng):
    # 1000 occupied voxels along a line, capacity 100 -> uniform merge, not
    # a truncated tail: output must still span the full extent
    pts = np.stack([np.arange(1000, dtype=np.float32) * 0.5 + 0.25,
                    np.zeros(1000, np.float32), np.zeros(1000, np.float32)], 1)
    out_xyz, out_mask, nvox = voxel.voxel_downsample_centroid_capped(
        jnp.asarray(pts), jnp.ones(1000, bool), 0.5, 100)
    assert int(nvox) == 1000
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    assert len(got) == 100
    assert got[:, 0].min() < 5.0 and got[:, 0].max() > 495.0


def test_voxel_representative_capped_under_capacity(rng):
    # under capacity: kept SET must be exactly the representative set
    # (first point per voxel), whatever the output order
    pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[::7] = False
    a = voxel.voxel_downsample_representative(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512)
    b = voxel.voxel_downsample_representative_capped(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512)
    assert int(a[2]) == int(b[2])
    sa = np.asarray(a[0])[np.asarray(a[1])]
    sb = np.asarray(b[0])[np.asarray(b[1])]
    assert sa.shape == sb.shape
    np.testing.assert_allclose(sa[np.lexsort(sa.T)], sb[np.lexsort(sb.T)], atol=0)


def test_voxel_representative_capped_overflow_uniform(rng):
    # 1000 occupied voxels along a line, capacity 100 -> uniform thinning of
    # REAL input points spanning the full extent (the silent spatial-prefix
    # truncation this replaced kept only the leading voxels — the ICP
    # submap bug fixed in round 4)
    pts = np.stack([np.arange(1000, dtype=np.float32) * 0.5 + 0.25,
                    np.zeros(1000, np.float32), np.zeros(1000, np.float32)], 1)
    out_xyz, out_mask, nvox = voxel.voxel_downsample_representative_capped(
        jnp.asarray(pts), jnp.ones(1000, bool), 0.5, 100)
    assert int(nvox) == 1000
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    assert len(got) == 100
    assert got[:, 0].min() < 5.0 and got[:, 0].max() > 495.0
    # every output is a REAL input point (no centroid blur)
    assert np.isin(got[:, 0], pts[:, 0]).all()


def test_voxel_sort_negative_and_large_coords(rng):
    # the packed 2x int32 sort keys rebase to the masked min: negative and
    # km-scale coordinates must group bit-identically to a NumPy oracle
    pts = np.concatenate([
        rng.uniform(-3000, 3000, size=(400, 3)),
        rng.uniform(-0.5, 0.5, size=(100, 3)),
    ]).astype(np.float32)
    mask = np.ones(500, bool)
    mask[::11] = False
    keep = np.asarray(voxel.voxel_unique_mask(jnp.asarray(pts), jnp.asarray(mask), 0.25))
    keys = np.floor(pts[mask] / 0.25).astype(np.int64)
    n_ref = len(np.unique(keys, axis=0))
    assert keep.sum() == n_ref
    assert not keep[~mask].any()


def test_voxel_unique_mask(rng):
    pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [1.0, 0, 0]], np.float32)
    keep = voxel.voxel_unique_mask(jnp.asarray(pts), jnp.ones(3, bool), 0.1)
    assert np.asarray(keep).sum() == 2
    assert bool(np.asarray(keep)[2])


# ----------------------------------------------------------------------- knn

def test_knn_matches_oracle(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    t = rng.normal(size=(300, 3)).astype(np.float32)
    tmask = np.ones(300, bool)
    tmask[5:20] = False
    d = np.asarray(knn.knn_sqdists(jnp.asarray(q), jnp.ones(64, bool), jnp.asarray(t), jnp.asarray(tmask), k=2, tile=128))
    full = ((q[:, None] - t[None]) ** 2).sum(-1)
    full[:, ~tmask] = 1e30
    ref = np.sort(full, axis=1)[:, :2]
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-5)


def test_nn_argmin_matches_oracle(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32) * 3
    t = rng.normal(size=(333, 3)).astype(np.float32) * 3
    d, i = knn.nn_sqdist_argmin(jnp.asarray(q), jnp.ones(50, bool), jnp.asarray(t), jnp.ones(333, bool), tile=128)
    full = ((q[:, None] - t[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(i), full.argmin(1))
    np.testing.assert_allclose(np.asarray(d), full.min(1), rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------- polar bin

def ref_make_descriptor(pts, R=20, S=60, max_r=80.0, h=2.0):
    """NumPy oracle mirroring Scancontext.cpp:151-195."""
    desc = np.full((R, S), -1000.0)
    for x, y, z in pts:
        zz = z + h
        r = np.hypot(x, y)
        if r > max_r:
            continue
        theta = np.degrees(np.arctan2(y, x)) % 360.0
        ring = max(min(R, int(np.ceil(r / max_r * R))), 1)
        sect = max(min(S, int(np.ceil(theta / 360.0 * S))), 1)
        desc[ring - 1, sect - 1] = max(desc[ring - 1, sect - 1], zz)
    desc[desc == -1000.0] = 0.0
    return desc


def test_polar_bin_matches_oracle(rng):
    pts = rng.normal(size=(400, 3)).astype(np.float32) * 30
    desc = np.asarray(polar_bin.make_descriptor(jnp.asarray(pts), jnp.ones(400, bool)))
    ref = ref_make_descriptor(pts)
    np.testing.assert_allclose(desc, ref, atol=1e-5)
