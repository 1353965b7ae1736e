"""Occlusion-culling exactness (ltm.kernels.occlusion).

The culling contract: a culled (keyframe, block) pair can neither flag a
point nor displace a pixel minimum, so culled sweeps equal full sweeps
bit-for-bit.  Tested at three levels: the footprint-max bound itself, the
preselected discrepancy sweep, and the two-phase fused winner pass.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ltm.kernels.blocks import (
    block_fused_phase_a,
    block_fused_phase_b,
    block_fused_visibility_images,
    block_sweep_discrepancy,
    block_sweep_discrepancy_vs_images_presel,
    build_block_map,
    required_k_blocks,
)
from ltm.kernels.occlusion import (
    block_rect_and_rmin,
    build_range_pyramid,
    compact_survivors,
    cull_blocks_vs_images,
    effective_range_image,
    footprint_max,
)
from ltm.kernels.projection import (
    NO_POINT,
    range_image,
    rimg_shape,
    spherical_project,
)

FOV = (50.0, 360.0)


def _random_scene(rng, n_map=20000, spread=120.0):
    """Clustered map so blocks get tight bounding balls."""
    centers = rng.uniform(-spread, spread, (40, 3)) * np.array([1, 1, 0.05])
    pts = (centers[rng.integers(0, 40, n_map)] +
           rng.normal(0, 4.0, (n_map, 3))).astype(np.float32)
    return pts


@pytest.mark.parametrize("yaw", [0.0, 0.7])
def test_footprint_max_bounds_true_max(rng, yaw):
    """For every block, the footprint tap-max must dominate the image max
    over the block's ACTUAL projected pixels (the conservative contract) —
    including through a rotated viewpoint (the AABB re-box path)."""
    shape = rimg_shape(FOV, 2.5)
    pts = _random_scene(rng)
    bm, ov = build_block_map(jnp.asarray(pts), jnp.ones(len(pts), bool),
                             cell_size=20.0, n_blocks=256, block_capacity=256)
    assert int(ov) == 0
    c, s = np.cos(yaw), np.sin(yaw)
    Tinv = np.eye(4, dtype=np.float32)
    Tinv[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    Tinv[:3, 3] = [5.0, -3.0, 0.5]
    Tinv_j = jnp.asarray(Tinv)
    img = rng.uniform(1.0, 300.0, (shape[0] * shape[1],)).astype(np.float32)
    pyr = build_range_pyramid(jnp.asarray(img), shape)
    r0, r1, c0, w, r_min = block_rect_and_rmin(bm.bmin, bm.bmax, Tinv_j, FOV, shape)
    fmax = np.asarray(footprint_max(pyr, r0, r1, c0, w, shape))

    local = np.asarray(bm.flat_xyz()) @ Tinv[:3, :3].T + Tinv[:3, 3]
    cap = bm.block_capacity
    bpix, brng = spherical_project(jnp.asarray(local), FOV, shape)
    bpix = np.asarray(bpix).reshape(-1, cap)
    brng = np.asarray(brng).reshape(-1, cap)
    valid = np.asarray(bm.block_valid)
    bmask = np.asarray(bm.mask)
    checked = 0
    for b in range(bm.num_blocks):
        if not valid[b] or not bmask[b].any():
            continue
        true_max = img[bpix[b][bmask[b]]].max()
        assert fmax[b] >= true_max - 1e-3, (b, fmax[b], true_max)
        # r_min lower-bounds every member range (in the rotated frame)
        assert np.asarray(r_min)[b] <= brng[b][bmask[b]].min() + 1e-3
        checked += 1
    assert checked > 50


@pytest.mark.parametrize("reverse", [False, True])
def test_culled_sweep_matches_full(rng, reverse):
    """Preselected (occlusion-culled) discrepancy sweep == full block sweep."""
    shape = rimg_shape(FOV, 2.5)
    # the reverse (ND) slack is +kValidDiffUpperBound=200 m, so culling only
    # bites once blocks sit >200 m beyond the image content — use a wider map
    pts = _random_scene(rng, spread=500.0 if reverse else 120.0)
    n = len(pts)
    bm, ov = build_block_map(jnp.asarray(pts), jnp.ones(n, bool),
                             cell_size=20.0, n_blocks=512 if reverse else 256,
                             block_capacity=256)
    assert int(ov) == 0

    K = 4
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(-60, 60, K)
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)
    scans = jnp.asarray(rng.normal(0, 25.0, (K, 4096, 3)).astype(np.float32))
    smask = jnp.ones((K, 4096), bool)
    imgs = jnp.stack([range_image(scans[k], smask[k], FOV, shape) for k in range(K)])

    full = block_sweep_discrepancy(
        bm, scans, smask, pose_inv, poses_j, FOV, shape,
        k_blocks=bm.num_blocks, max_range=1e6, diff_threshold=0.1,
        reverse=reverse)

    slack = 200.0 if reverse else -0.1
    eff = effective_range_image(imgs, -jnp.inf)
    survive = cull_blocks_vs_images(bm.bmin, bm.bmax, bm.block_valid,
                                    pose_inv, eff, FOV, shape, slack)
    sel_idx, sel_valid, k_sel = compact_survivors(np.asarray(survive))
    assert k_sel < bm.num_blocks  # culling must actually cut something here
    culled = block_sweep_discrepancy_vs_images_presel(
        bm, bm.flat_mask(), imgs, pose_inv,
        jnp.asarray(sel_idx), jnp.asarray(sel_valid), FOV, shape,
        diff_threshold=0.1, reverse=reverse)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(culled))
    assert np.asarray(full).sum() > 0


def test_two_phase_winner_pass_matches_full(rng):
    """Phase A+B (near blocks + occlusion-surviving far blocks) must equal
    the single-pass fused winner projection bit-for-bit."""
    proj_shape = rimg_shape(FOV, 3.0)
    shape = rimg_shape(FOV, 2.5)
    pts = _random_scene(rng)
    n = len(pts)
    bm, ov = build_block_map(jnp.asarray(pts), jnp.ones(n, bool),
                             cell_size=20.0, n_blocks=256, block_capacity=256)
    assert int(ov) == 0
    static = bm.flat_mask() & (jnp.arange(n := bm.num_blocks * bm.block_capacity) % 7 != 0)

    K = 4
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(-60, 60, K)
    pose_inv = jnp.asarray(np.linalg.inv(poses))
    poses_j = jnp.asarray(poses)
    scale = float(2 ** 27) / 512.0

    win_full, imgs_full = block_fused_visibility_images(
        bm, static, pose_inv, poses_j, FOV, shape, proj_shape,
        k_blocks=bm.num_blocks, max_range=1e6, scale=scale)

    r_near = 60.0
    k_near = required_k_blocks(bm, poses[:, :3, 3], r_near)
    sel_a, sel_a_valid, packed, survive = block_fused_phase_a(
        bm, static, pose_inv, poses_j, FOV, shape, proj_shape,
        k_near=k_near, r_near=r_near, scale=scale)
    sel_b, sel_b_valid, k_b = compact_survivors(np.asarray(survive))
    # some far blocks must actually be culled for the test to mean anything
    assert np.asarray(survive).sum() < K * int(np.asarray(bm.block_valid).sum())
    sel_ab = jnp.concatenate([sel_a, jnp.asarray(sel_b)], axis=1)
    sel_ab_valid = jnp.concatenate([sel_a_valid, jnp.asarray(sel_b_valid)], axis=1)
    win_2p, imgs_2p = block_fused_phase_b(
        bm, static, pose_inv, packed, jnp.asarray(sel_b), jnp.asarray(sel_b_valid),
        sel_ab, sel_ab_valid, FOV, shape, proj_shape, scale=scale)

    np.testing.assert_array_equal(np.asarray(win_full), np.asarray(win_2p))
    np.testing.assert_array_equal(np.asarray(imgs_full), np.asarray(imgs_2p))
    assert np.asarray(win_full).sum() > 0
