"""Occlusion-aware block culling for spherical range-image sweeps.

The per-sweep range bounds in ``ltm.kernels.blocks`` cull by DISTANCE only:
every block within ``max_range`` of the viewpoint is processed.  But the
winner/discrepancy tests are per-PIXEL: a far block can only matter if some
pixel in its angular footprint currently "sees" at least as far.  This module
adds that second, image-driven culling axis — the spherical analog of
hierarchical-Z occlusion culling from rasterization — while preserving the
exactness guarantees of the block sweeps:

  * ``build_range_pyramid``  — per-keyframe max-pyramid of a range image
    (4 static tile levels, ragged edges padded with the max-identity);
  * ``block_rect_and_rmin``  — conservative pixel-rect footprint of a block's
    bounding ball from a viewpoint (elevation via the 3-D angular radius,
    azimuth via the horizontal disk; both are supersets of the true
    projected footprint, and the rect uses the SAME row/col formula as
    ``spherical_project`` so clamped out-of-FOV points stay covered);
  * ``footprint_max``        — max over the rect via <=8 taps at the level
    whose tile covers the rect extent (2 row tiles x 4 col tiles — 4 cover
    azimuth wrap-around);
  * ``cull_blocks_vs_images`` — (K, n_blocks) survival bits: a block is
    culled for keyframe k iff ``r_min(block) > footprint_max + slack``.

Exactness (why culling never changes a flagged/winner set):

  Forward discrepancy (``scan − map``, slack = −thres): a culled block's
  every point p has ``range(p) >= r_min > img(pix) − thres`` at ANY footprint
  pixel, so ``diff = img − range < thres`` — p can't be flagged; and if p had
  been a pixel minimum, every other point at that pixel is farther still, so
  no remaining point's flag flips either (both diffs only shrink further
  below the threshold).  Empty source pixels flag nothing (``diff`` with
  NO_POINT falls outside (thres, upper)), so they contribute −inf to the
  footprint max.

  Reversed discrepancy (``map − scan``, slack = +kValidDiffUpperBound):
  culled points have ``diff = range − img > upper`` — outside the valid band
  (``calcDescrepancyAndParseDynamicPointIdx``, ``Removerter.cpp:381-413``);
  same argument for displaced minima.

  Winner projections (slack = +eps): a culled point's range strictly exceeds
  the provisional pixel minimum (phase-A image), which only decreases as more
  points scatter — it can never win its pixel nor displace the minimum, so
  the final winner mask and winner image are bit-identical.  Empty pixels are
  +inf (any point would win there), keeping those blocks alive.

The survival bits are data-dependent, so sweeps consume them through a
host-compacted per-keyframe block index list (``compact_survivors``) with a
static, pow-2-bucketed width — the same recompile-bounding discipline as
``required_k_blocks``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltm.kernels.projection import NO_POINT, apply_pose

__all__ = [
    "LEVELS",
    "build_range_pyramid",
    "block_rect_and_rmin",
    "footprint_max",
    "cull_blocks_vs_images",
    "compact_survivors",
]

# static tile sizes; level i covers rect extents up to LEVELS[i] pixels with
# <=2 tiles per axis.  Rects wider than the top level survive unconditionally.
LEVELS: Tuple[int, ...] = (8, 32, 128, 512)


def _level_shapes(shape):
    nrow, ncol = shape
    return [(-(-nrow // t), -(-ncol // t)) for t in LEVELS]


def _level_offsets(shape):
    offs, total = [], 0
    for (r, c) in _level_shapes(shape):
        offs.append(total)
        total += r * c
    return offs, total


def build_range_pyramid(eff_img: jax.Array, shape) -> jax.Array:
    """Flat concat of max-pooled levels of one effective-range image.

    ``eff_img``: (nrow*ncol,) with empties already mapped to the correct
    identity for the caller's test (−inf for discrepancy culling, +inf for
    winner culling).  Ragged tile edges pad with −inf (max identity).
    """
    nrow, ncol = shape
    img2 = eff_img.reshape(nrow, ncol)
    parts = []
    for t, (tr, tc) in zip(LEVELS, _level_shapes(shape)):
        pad_r, pad_c = tr * t - nrow, tc * t - ncol
        p = jnp.pad(img2, ((0, pad_r), (0, pad_c)), constant_values=-jnp.inf)
        parts.append(p.reshape(tr, t, tc, t).max(axis=(1, 3)).reshape(-1))
    return jnp.concatenate(parts)


def block_rect_and_rmin(bmin: jax.Array, bmax: jax.Array, Tinv: jax.Array,
                        fov, shape):
    """Conservative footprint rect + minimum possible range per block, from
    the blocks' global-frame AABBs seen through ``Tinv`` (lidar_from_global).

    AABBs beat bounding balls decisively here: LiDAR surface blocks are flat
    (ground slabs, wall sheets), so a ball's ±asin(ρ/d) elevation half-width
    (~3° for a 25 m cell at 300 m) sweeps whole sky bands into the
    footprint, while the slab's true elevation extent is a fraction of a
    pixel.  The 8 AABB corners are rotated into the lidar frame and re-boxed
    (conservative superset of the rotated box), then:

      * range: distance from the origin to the lidar-frame box (per-axis
        clamp) — exact for the re-boxed volume;
      * elevation: extremal over the box is attained with z at a box face
        and horizontal distance at its nearest/farthest — closed form from
        (zmin, zmax, dxy_min, dxy_max);
      * azimuth: extremal over a convex xy-rectangle from an external point
        is attained at a corner; the interval is the complement of the
        largest gap among the 4 corner azimuths (wrap-safe).  Origin inside
        the rectangle -> full circle.

    Returns (r0, r1, c0, width_cols, r_min) — rows clamped to the image
    (covering out-of-FOV points, which ``spherical_project`` clamps to the
    border rows), columns as an unwrapped start+width (width == ncol means
    full circle).
    """
    vfov, hfov = float(fov[0]), float(fov[1])
    nrow, ncol = shape

    # 8 corners -> lidar frame -> axis-aligned re-box (conservative)
    corners = jnp.stack([
        jnp.stack([jnp.where(bits & 1, bmax[:, 0], bmin[:, 0]),
                   jnp.where(bits & 2, bmax[:, 1], bmin[:, 1]),
                   jnp.where(bits & 4, bmax[:, 2], bmin[:, 2])], axis=-1)
        for bits in range(8)
    ], axis=1)                                           # (B, 8, 3)
    cl = apply_pose(corners, Tinv)
    lo = jnp.min(cl, axis=1)                             # (B, 3)
    hi = jnp.max(cl, axis=1)

    # range bounds of the box from the origin
    near = jnp.maximum(jnp.maximum(lo, -hi), 0.0)        # per-axis distance
    r_min = jnp.linalg.norm(near, axis=-1)

    # horizontal (xy) distance extremes
    dxy_min = jnp.linalg.norm(near[:, :2], axis=-1)
    cx = jnp.maximum(jnp.abs(lo[:, 0]), jnp.abs(hi[:, 0]))
    cy = jnp.maximum(jnp.abs(lo[:, 1]), jnp.abs(hi[:, 1]))
    dxy_max = jnp.sqrt(cx * cx + cy * cy)

    # elevation extremes: positive z maximizes el at dxy_min, negative at
    # dxy_max (and vice versa for the minimum); arctan2 handles dxy=0
    zmin, zmax = lo[:, 2], hi[:, 2]
    el_hi = jnp.degrees(jnp.arctan2(zmax, jnp.where(zmax >= 0, dxy_min, dxy_max)))
    el_lo = jnp.degrees(jnp.arctan2(zmin, jnp.where(zmin >= 0, dxy_max, dxy_min)))
    row_of = lambda e: jnp.round(nrow * (1.0 - (e + vfov / 2.0) / vfov))
    r0 = jnp.clip(row_of(el_hi) - 1, 0, nrow - 1).astype(jnp.int32)
    r1 = jnp.clip(row_of(el_lo) + 1, 0, nrow - 1).astype(jnp.int32)

    # azimuth interval from the 4 xy-rectangle corners: complement of the
    # largest circular gap (degrees in [0, 360))
    az = jnp.degrees(jnp.arctan2(
        jnp.stack([lo[:, 1], lo[:, 1], hi[:, 1], hi[:, 1]], axis=-1),
        jnp.stack([lo[:, 0], hi[:, 0], lo[:, 0], hi[:, 0]], axis=-1)))
    az = jnp.mod(az, 360.0)
    az_s = jnp.sort(az, axis=-1)                         # (B, 4)
    gaps = jnp.concatenate([az_s[:, 1:] - az_s[:, :-1],
                            (az_s[:, :1] + 360.0 - az_s[:, -1:])], axis=-1)
    gi = jnp.argmax(gaps, axis=-1)
    max_gap = jnp.take_along_axis(gaps, gi[:, None], axis=-1)[:, 0]
    # interval starts where the largest gap ends
    start = jnp.take_along_axis(az_s, ((gi + 1) % 4)[:, None], axis=-1)[:, 0]
    span = 360.0 - max_gap
    inside = (lo[:, 0] <= 0) & (hi[:, 0] >= 0) & (lo[:, 1] <= 0) & (hi[:, 1] >= 0)

    # signed-azimuth column convention of spherical_project: a ∈ [−180,180],
    # col = round(ncol·(a + hfov/2)/hfov).  For the wrap arithmetic below the
    # column map must itself wrap, which holds only for hfov == 360 (the
    # reference's and this pipeline's only operating point); other hfov
    # values conservatively take the full width.
    a_start = jnp.mod(start + 180.0, 360.0) - 180.0
    c_lo = jnp.round(ncol * ((a_start + hfov / 2.0) / hfov)) - 1
    n_cols = jnp.round(span / 360.0 * ncol) + 3
    full = inside | (span >= 359.0) | (abs(hfov - 360.0) > 1e-6)
    width = jnp.where(full, ncol, jnp.clip(n_cols, 1, ncol)).astype(jnp.int32)
    c0 = jnp.mod(c_lo.astype(jnp.int32), ncol)
    c0 = jnp.where(full, 0, c0)
    return r0, r1, c0, width, r_min


def footprint_max(pyr: jax.Array, r0, r1, c0, width, shape) -> jax.Array:
    """Max of the effective-range image over each block's rect (conservative:
    tap maxima cover supersets of the rect).  Rects larger than the top level
    return +inf (survive unconditionally)."""
    nrow, ncol = shape
    offs, _ = _level_offsets(shape)
    shapes = _level_shapes(shape)
    row_ext = r1 - r0 + 1
    ext = jnp.maximum(row_ext, width)

    # smallest level whose tile covers the extent
    lvl = jnp.zeros_like(ext)
    for t in LEVELS[:-1]:
        lvl = lvl + (ext > t).astype(jnp.int32)
    too_big = ext > LEVELS[-1]

    t_arr = jnp.asarray(LEVELS, jnp.int32)[lvl]
    off = jnp.asarray(offs, jnp.int32)[lvl]
    n_tc = jnp.asarray([s[1] for s in shapes], jnp.int32)[lvl]

    ra = r0 // t_arr
    rb = r1 // t_arr
    # wrap-aware column tiles: the rect is [c0, c0+width-1] mod ncol — split
    # into <=2 unwrapped pieces, each spanning <=2 tiles at this level
    c1 = c0 + width - 1
    wrapped = c1 >= ncol
    ca = c0 // t_arr
    cb = jnp.minimum(c1, ncol - 1) // t_arr
    cc = jnp.where(wrapped, 0, ca)
    cd = jnp.where(wrapped, (c1 - ncol) // t_arr, cb)

    m = jnp.full(r0.shape, -jnp.inf, pyr.dtype)
    for rt in (ra, rb):
        for ct in (ca, cb, cc, cd):
            m = jnp.maximum(m, pyr[off + rt * n_tc + ct])
    return jnp.where(too_big, jnp.inf, m)


@partial(jax.jit, static_argnames=("fov", "shape"))
def cull_blocks_vs_images(
    bmin: jax.Array,           # (B, 3) block AABB minima, global frame
    bmax: jax.Array,           # (B, 3) block AABB maxima
    candidate: jax.Array,      # (B,) blocks worth testing (valid & occupied)
    pose_inv: jax.Array,       # (K, 4, 4) lidar_from_global
    eff_imgs: jax.Array,       # (K, nrow*ncol) effective-range images
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    slack: float,
) -> jax.Array:
    """(K, B) survival bits: block b matters for keyframe k iff its minimum
    possible range can reach ``footprint_max + slack`` (see module docstring
    for the per-sweep slack values and exactness arguments)."""

    def body(_, inp):
        Tinv, img = inp
        pyr = build_range_pyramid(img, shape)
        r0, r1, c0, width, r_min = block_rect_and_rmin(bmin, bmax, Tinv, fov, shape)
        fmax = footprint_max(pyr, r0, r1, c0, width, shape)
        return None, candidate & (r_min <= fmax + slack)

    _, survive = jax.lax.scan(body, None, (pose_inv, eff_imgs))
    return survive


def effective_range_image(imgs: jax.Array, empty_to: float) -> jax.Array:
    """Map NO_POINT empties of scatter-min range images to ±inf for culling."""
    return jnp.where(imgs >= NO_POINT, empty_to, imgs)


def compact_survivors(survive: np.ndarray, round_to: int = 128):
    """Host-side: per-keyframe survivor block index lists, padded to a
    static, ``round_to``-bucketed width (bounds recompiles the same way
    ``required_k_blocks`` does).  Returns (sel_idx (K, k_sel) int32,
    sel_valid (K, k_sel) bool, k_sel).  k_sel >= 1 always (dummy row)."""
    survive = np.asarray(survive)
    K, B = survive.shape
    counts = survive.sum(axis=1)
    k_sel = int(counts.max(initial=0))
    k_sel = max(((k_sel + round_to - 1) // round_to) * round_to, round_to)
    k_sel = min(k_sel, max(((B + round_to - 1) // round_to) * round_to, round_to))
    sel_idx = np.zeros((K, k_sel), np.int32)
    sel_valid = np.zeros((K, k_sel), bool)
    for k in range(K):
        idx = np.flatnonzero(survive[k])
        n = min(len(idx), k_sel)
        sel_idx[k, :n] = idx[:n]
        sel_valid[k, :n] = True
    return sel_idx, sel_valid, k_sel
