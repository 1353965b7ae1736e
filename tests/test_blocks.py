import jax.numpy as jnp
import numpy as np

from ltm.kernels import blocks, projection


def make_scene(rng, n=4096):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array([40, 40, 3], np.float32)
    mask = rng.uniform(size=n) > 0.1
    return jnp.asarray(pts), jnp.asarray(mask)


def test_block_map_preserves_points(rng):
    xyz, mask = make_scene(rng)
    bm, overflow = blocks.build_block_map(xyz, mask, 20.0, n_blocks=512, block_capacity=128)
    assert int(overflow) == 0
    got = np.asarray(bm.flat_xyz())[np.asarray(bm.flat_mask())]
    ref = np.asarray(xyz)[np.asarray(mask)]
    got_s = got[np.lexsort(got.T)]
    ref_s = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_s, ref_s, atol=0)
    # blocks are spatially tight: member distance <= radius
    d = np.linalg.norm(np.asarray(bm.xyz) - np.asarray(bm.centers)[:, None], axis=-1)
    d = np.where(np.asarray(bm.mask), d, 0)
    assert np.all(d <= np.asarray(bm.radius)[:, None] + 1e-4)


def test_block_sweep_matches_flat(rng):
    fov, shape = (50.0, 360.0), (25, 180)
    xyz, mask = make_scene(rng)
    K = 3
    scans = jnp.asarray(rng.normal(size=(K, 512, 3)).astype(np.float32) * 30)
    smask = jnp.ones((K, 512), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = [-20, 0, 20]
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)

    ref_dyn = projection.sweep_discrepancy(xyz, mask, scans, smask, pose_inv, fov, shape, 0.1, False)
    ref_pts = np.asarray(xyz)[np.asarray(ref_dyn)]

    bm, _ = blocks.build_block_map(xyz, mask, 20.0, n_blocks=512, block_capacity=128)
    dyn = blocks.block_sweep_discrepancy(
        bm, scans, smask, pose_inv, poses_j, fov, shape,
        k_blocks=512, max_range=1e6, diff_threshold=0.1, reverse=False,
    )
    got_pts = np.asarray(bm.flat_xyz())[np.asarray(dyn)]
    np.testing.assert_allclose(
        got_pts[np.lexsort(got_pts.T)], ref_pts[np.lexsort(ref_pts.T)], atol=0
    )

    # culled version: ball radius 200 covers the whole scene -> identical
    dyn_c = blocks.block_sweep_discrepancy(
        bm, scans, smask, pose_inv, poses_j, fov, shape,
        k_blocks=256, max_range=200.0, diff_threshold=0.1, reverse=False,
    )
    got_c = np.asarray(bm.flat_xyz())[np.asarray(dyn_c)]
    np.testing.assert_allclose(
        got_c[np.lexsort(got_c.T)], ref_pts[np.lexsort(ref_pts.T)], atol=0
    )


def test_block_sweep_visibility_matches_flat(rng):
    fov, shape = (50.0, 360.0), (25, 180)
    xyz, mask = make_scene(rng)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[:, 0, 3] = [-10, 15]
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    ref = projection.sweep_visibility(xyz, mask, pose_inv, fov, shape)
    ref_pts = np.asarray(xyz)[np.asarray(ref)]

    bm, _ = blocks.build_block_map(xyz, mask, 20.0, n_blocks=512, block_capacity=128)
    vis = blocks.block_sweep_visibility(
        bm, jnp.ones(bm.num_blocks * bm.block_capacity, bool),
        pose_inv, jnp.asarray(poses), fov, shape, k_blocks=512, max_range=1e6,
    )
    got_pts = np.asarray(bm.flat_xyz())[np.asarray(vis)]
    np.testing.assert_allclose(
        got_pts[np.lexsort(got_pts.T)], ref_pts[np.lexsort(ref_pts.T)], atol=0
    )


def test_cached_image_filter_matches_combined(rng):
    """projected_scan_images + *_vs_images == the one-shot projected sweep
    (both flat and blocked), for forward and reversed diff."""
    fov, shape, proj_shape = (50.0, 360.0), (25, 180), (30, 216)
    t_xyz, t_mask = make_scene(rng)
    s_xyz, s_mask = make_scene(rng, n=3000)
    K = 3
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = [-25, 5, 30]
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)

    for reverse in (False, True):
        ref = projection.sweep_discrepancy_projected(
            t_xyz, t_mask, s_xyz, s_mask, pose_inv, fov, shape, proj_shape,
            0.1, reverse)
        imgs = projection.projected_scan_images(
            s_xyz, s_mask, pose_inv, fov, shape, proj_shape)
        got = projection.sweep_discrepancy_vs_images(
            t_xyz, t_mask, imgs, pose_inv, fov, shape, 0.1, reverse)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        t_bm, _ = blocks.build_block_map(t_xyz, t_mask, 20.0, 512, 128)
        s_bm, _ = blocks.build_block_map(s_xyz, s_mask, 20.0, 512, 128)
        ones_t = t_bm.flat_mask()
        ones_s = s_bm.flat_mask()
        ref_b = blocks.block_sweep_discrepancy_projected(
            t_bm, ones_t, s_bm, ones_s, pose_inv, poses_j, fov, shape,
            proj_shape, k_blocks=512, max_range=1e6,
            diff_threshold=0.1, reverse=reverse)
        imgs_b = blocks.block_projected_scan_images(
            s_bm, ones_s, pose_inv, poses_j, fov, shape, proj_shape,
            k_blocks=512, max_range=1e6)
        got_b = blocks.block_sweep_discrepancy_vs_images(
            t_bm, ones_t, imgs_b, pose_inv, poses_j, fov, shape,
            k_blocks=512, max_range=1e6, diff_threshold=0.1, reverse=reverse)
        np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))


def test_block_sweep_exact_when_culling_bites(rng):
    """Culled forward sweep == whole-map sweep with max_range = max scan
    range + diff threshold, on a corridor much longer than the bound (the
    bench.py configuration in miniature): blocks ARE dropped per keyframe,
    yet the flagged set is identical (blocks.py docstring bound argument)."""
    fov, shape = (50.0, 360.0), (25, 180)
    n = 60_000
    pts = np.stack([
        rng.uniform(0.0, 600.0, n),          # corridor ~5x longer than bound
        rng.normal(size=n) * 20,
        rng.normal(size=n) * 2,
    ], 1).astype(np.float32)
    xyz = jnp.asarray(pts)
    mask = jnp.asarray(rng.uniform(size=n) > 0.05)

    K = 4
    raw = rng.normal(size=(K, 1024, 3)).astype(np.float32) * np.array([30, 30, 2], np.float32)
    rr = np.linalg.norm(raw, axis=-1, keepdims=True)
    max_scan = 60.0
    raw = np.where(rr > max_scan, raw * (max_scan / rr), raw)
    scans = jnp.asarray(raw)
    smask = jnp.ones((K, 1024), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = [80, 220, 380, 520]
    pose_inv = jnp.asarray(np.linalg.inv(poses))

    ref_dyn = projection.sweep_discrepancy(xyz, mask, scans, smask, pose_inv, fov, shape, 0.1, False)
    ref_pts = np.asarray(xyz)[np.asarray(ref_dyn)]

    bm, ov = blocks.build_block_map(xyz, mask, 20.0, n_blocks=1024, block_capacity=128)
    assert int(ov) == 0
    max_range = max_scan + 0.1 + 0.1
    kb = blocks.required_k_blocks(bm, poses[:, :3, 3], max_range, round_to=32)
    assert kb < bm.num_blocks  # culling must actually drop blocks
    dyn = blocks.block_sweep_discrepancy(
        bm, scans, smask, pose_inv, jnp.asarray(poses), fov, shape,
        k_blocks=kb, max_range=max_range, diff_threshold=0.1, reverse=False,
    )
    got_pts = np.asarray(bm.flat_xyz())[np.asarray(dyn)]
    np.testing.assert_allclose(
        got_pts[np.lexsort(got_pts.T)], ref_pts[np.lexsort(ref_pts.T)], atol=0
    )


def test_fused_visibility_images_matches_pair(rng):
    """The fused packed winner pass == (sweep_visibility at proj res +
    projected_scan_images), flat and blocked: same visibility union, images
    equal to fixed-point resolution, identical downstream flag decisions."""
    fov, shape, proj_shape = (50.0, 360.0), (25, 180), (30, 216)
    s_xyz, s_mask = make_scene(rng, n=3000)
    K = 3
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = [-25, 5, 30]
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)
    scale = float(2 ** 27) / 512.0  # bound 512 m covers the scene

    ref_vis = projection.sweep_visibility(s_xyz, s_mask, pose_inv, fov, proj_shape)
    ref_imgs = projection.projected_scan_images(
        s_xyz, s_mask, pose_inv, fov, shape, proj_shape)
    win, imgs = projection.fused_visibility_images(
        s_xyz, s_mask, pose_inv, fov, shape, proj_shape, scale=scale)
    # visibility union: packed tie-breaking keeps ONE winner per pixel where
    # the old kernel kept all exact-range ties — random f32 data has none
    np.testing.assert_array_equal(np.asarray(win), np.asarray(ref_vis))
    # images agree to the fixed-point resolution (here ~4 um)
    both = (np.asarray(imgs) < 9000) & (np.asarray(ref_imgs) < 9000)
    assert (np.asarray(imgs) < 9000).sum() == (np.asarray(ref_imgs) < 9000).sum()
    np.testing.assert_allclose(np.asarray(imgs)[both], np.asarray(ref_imgs)[both],
                               atol=2.0 * 512.0 / 2 ** 27)

    # identical downstream decisions
    t_xyz, t_mask = make_scene(rng)
    for reverse in (False, True):
        a = projection.sweep_discrepancy_vs_images(
            t_xyz, t_mask, imgs, pose_inv, fov, shape, 0.1, reverse)
        b = projection.sweep_discrepancy_vs_images(
            t_xyz, t_mask, ref_imgs, pose_inv, fov, shape, 0.1, reverse)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # blocked == flat (bit-identical: same kernel over a gathered layout)
    s_bm, _ = blocks.build_block_map(s_xyz, s_mask, 20.0, 512, 128)
    win_b, imgs_b = blocks.block_fused_visibility_images(
        s_bm, s_bm.flat_mask(), pose_inv, poses_j, fov, shape, proj_shape,
        k_blocks=512, max_range=1e6, scale=scale)
    got_pts = np.asarray(s_bm.flat_xyz())[np.asarray(win_b)]
    ref_pts = np.asarray(s_xyz)[np.asarray(win)]
    np.testing.assert_allclose(
        got_pts[np.lexsort(got_pts.T)], ref_pts[np.lexsort(ref_pts.T)], atol=0)
    np.testing.assert_array_equal(np.asarray(imgs_b), np.asarray(imgs))
