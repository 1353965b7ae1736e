"""Range-image projection and visibility-discrepancy kernels.

This is the hot path of LT-removert: the reference projects the whole global
map into every keyframe's spherical range image with an OpenMP scatter-min
that *tolerates a data race* (``ltremovert/src/utility.cpp:92-142``,
``ltremovert/src/Removerter.cpp:109-156``) and collects per-pixel winning
point ids.  The TPU formulation is deterministic and fixed-shape:

  * ``range_image``   — scatter-min of point ranges into the pixel grid
    (XLA ``scatter-min``; race-free by construction);
  * winner test      — a point "owns" its pixel iff its range equals the
    pixel minimum (gather + compare), replacing the ptidx image;
  * ``discrepancy_mask`` — the Removert rule: pixel diff = scan − map (or
    reversed for ND checks, ``Removerter.cpp:516``); a winning map point is
    dynamic iff ``thres < diff < upper``
    (``calcDescrepancyAndParseDynamicPointIdx``, ``Removerter.cpp:381-413``).

Everything is jit/vmap-safe with static image shapes; sweeps over keyframes
stream with ``lax.map`` and OR-reduce boolean masks over the fixed-size map.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "apply_pose",
    "rimg_shape",
    "spherical_project",
    "range_image",
    "winner_mask",
    "packed_winner_image",
    "fused_visibility_images",
    "discrepancy_mask",
    "discrepancy_vs_image",
    "projected_scan_images",
    "sweep_discrepancy",
    "sweep_discrepancy_vs_images",
    "sweep_visibility",
]

NO_POINT = 10000.0        # kFlagNoPOINT (ltremovert/include/removert/utility.h:93)
VALID_DIFF_UB = 200.0     # kValidDiffUpperBound (utility.h:94)



def apply_pose(xyz: jax.Array, Tinv: jax.Array) -> jax.Array:
    """Global -> lidar-frame point transform at TRUE f32 matmul precision.

    The TPU's default f32 matmul truncates operands to bfloat16 (measured
    4-7.5 m error at km-scale map coordinates — fatal for 0.1 m visibility
    thresholds); the (N,3)x(3,3) product is bandwidth-bound, so HIGHEST
    costs nothing.
    """
    return jnp.matmul(xyz, Tinv[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + Tinv[:3, 3]


def rimg_shape(fov: Tuple[float, float], alpha: float) -> Tuple[int, int]:
    """Image rows/cols for a FOV at resolution multiplier alpha
    (reference ``resetRimgSize``, ``ltremovert/src/utility.cpp:222-236``)."""
    vfov, hfov = fov
    return int(round(vfov * alpha)), int(round(hfov * alpha))


def spherical_project(xyz: jax.Array, fov: Tuple[float, float], shape: Tuple[int, int]):
    """Points -> (pixel linear index, range).

    Pixel formula is bit-matched to the reference
    (``ltremovert/src/Removerter.cpp:137-138``): row/col = round() of the
    normalized elevation/azimuth, clamped to the image.
    """
    vfov, hfov = float(fov[0]), float(fov[1])
    nrow, ncol = shape
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rxy = jnp.sqrt(x * x + y * y)
    rng = jnp.sqrt(x * x + y * y + z * z)
    az = jnp.degrees(jnp.arctan2(y, x))
    el = jnp.degrees(jnp.arctan2(z, rxy))
    row = jnp.round(nrow * (1.0 - (el + vfov / 2.0) / vfov))
    col = jnp.round(ncol * ((az + hfov / 2.0) / hfov))
    row = jnp.clip(row, 0, nrow - 1).astype(jnp.int32)
    col = jnp.clip(col, 0, ncol - 1).astype(jnp.int32)
    return row * ncol + col, rng


def _project_min(xyz: jax.Array, mask: jax.Array, fov, shape):
    """(pixel ids, ranges, scatter-min image) — the shared projection core."""
    pix, rng = spherical_project(xyz, fov, shape)
    rng_masked = jnp.where(mask, rng, jnp.inf)
    n_pix = shape[0] * shape[1]
    img = jnp.full((n_pix,), NO_POINT, xyz.dtype)
    img = img.at[pix].min(rng_masked, mode="drop")
    return pix, rng, img


def range_image(xyz: jax.Array, mask: jax.Array, fov, shape) -> jax.Array:
    """Scatter-min range image, flattened (nrow*ncol,). Empty pixels = NO_POINT."""
    return _project_min(xyz, mask, fov, shape)[2]


def winner_mask(xyz: jax.Array, mask: jax.Array, fov, shape, img: jax.Array | None = None):
    """Mask of points that win (own) their pixel in the scatter-min image.

    Replaces the reference's per-pixel winning-index image
    (``map2RangeImg`` ptidx, ``utility.cpp:104,137``): a point is visible
    from this viewpoint iff it is the nearest point on its pixel.
    """
    pix, rng = spherical_project(xyz, fov, shape)
    if img is None:
        img = range_image(xyz, mask, fov, shape)
    return mask & (rng <= img[pix]), pix, rng, img


_PACKED_SENTINEL = jnp.iinfo(jnp.int32).max


def _pix_rowcol(xyz: jax.Array, fov, shape):
    """Row/col indices of :func:`spherical_project` (kept in sync)."""
    vfov, hfov = float(fov[0]), float(fov[1])
    nrow, ncol = shape
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rxy = jnp.sqrt(x * x + y * y)
    rng = jnp.sqrt(x * x + y * y + z * z)
    az = jnp.degrees(jnp.arctan2(y, x))
    el = jnp.degrees(jnp.arctan2(z, rxy))
    row = jnp.round(nrow * (1.0 - (el + vfov / 2.0) / vfov))
    col = jnp.round(ncol * ((az + hfov / 2.0) / hfov))
    row = jnp.clip(row, 0, nrow - 1).astype(jnp.int32)
    col = jnp.clip(col, 0, ncol - 1).astype(jnp.int32)
    return row, col, rng


def _pack_points(xyz_local: jax.Array, mask: jax.Array, fov,
                 proj_shape: Tuple[int, int], shape: Tuple[int, int],
                 scale: float):
    """(packed int32 per point, proj-shape pixel id per point) — the packing
    half of :func:`packed_winner_image`, split out so multi-phase passes
    (occlusion-culled winner projection, ``ltm.kernels.blocks``) can continue
    one scatter-min image across block subsets."""
    nrow_p, ncol_p = proj_shape
    nrow_s, ncol_s = shape
    if nrow_s > nrow_p or ncol_s > ncol_p:
        raise ValueError(f"shape {shape} must be no finer than proj_shape {proj_shape}")
    rratio = jnp.float32(nrow_s / nrow_p)
    cratio = jnp.float32(ncol_s / ncol_p)

    row_p, col_p, rng = _pix_rowcol(xyz_local, fov, proj_shape)
    row_s, col_s, _ = _pix_rowcol(xyz_local, fov, shape)
    base_r = jnp.round(rratio * row_p.astype(jnp.float32)).astype(jnp.int32)
    base_c = jnp.round(cratio * col_p.astype(jnp.float32)).astype(jnp.int32)
    dr = jnp.clip(row_s - base_r + 1, 0, 2)
    dc = jnp.clip(col_s - base_c + 1, 0, 2)
    q = jnp.clip(jnp.round(rng * scale), 0, float(2 ** 27 - 1)).astype(jnp.int32)
    packed = jnp.where(mask, q * 16 + dr * 4 + dc, _PACKED_SENTINEL)
    return packed, row_p * ncol_p + col_p


def _decode_winner_image(img_p: jax.Array, proj_shape: Tuple[int, int],
                         shape: Tuple[int, int], scale: float) -> jax.Array:
    """Dense decode of a packed proj-resolution winner image into the
    filter-resolution range image (the decode half of
    :func:`packed_winner_image`)."""
    nrow_p, ncol_p = proj_shape
    nrow_s, ncol_s = shape
    rratio = jnp.float32(nrow_s / nrow_p)
    cratio = jnp.float32(ncol_s / ncol_p)
    n_pix_p = nrow_p * ncol_p
    pidx = jnp.arange(n_pix_p, dtype=jnp.int32)
    prow = pidx // ncol_p
    pcol = pidx % ncol_p
    wbase_r = jnp.round(rratio * prow.astype(jnp.float32)).astype(jnp.int32)
    wbase_c = jnp.round(cratio * pcol.astype(jnp.float32)).astype(jnp.int32)
    valid = img_p != _PACKED_SENTINEL
    wq = img_p // 16
    wdr = (img_p // 4) % 4
    wdc = img_p % 4
    wrow = jnp.clip(wbase_r + wdr - 1, 0, nrow_s - 1)
    wcol = jnp.clip(wbase_c + wdc - 1, 0, ncol_s - 1)
    wpix = wrow * ncol_s + wcol
    wrng = jnp.where(valid, wq.astype(jnp.float32) / scale, jnp.inf)
    img_s = jnp.full((nrow_s * ncol_s,), NO_POINT, jnp.float32)
    return img_s.at[wpix].min(wrng, mode="drop")


def packed_winner_image(xyz_local: jax.Array, mask: jax.Array, fov,
                        proj_shape: Tuple[int, int], shape: Tuple[int, int],
                        scale: float):
    """Winner mask at ``proj_shape`` + range image at ``shape`` of the
    winners — in ONE scatter-min pass over the points.

    This fuses the hot pair ``winner_mask`` (projected static scan, α=3) →
    ``range_image`` (filter-resolution image of those winners): the naive
    composition costs 3 dynamic-index ops per point per keyframe (scatter +
    gather + scatter) and dynamic-index ops serialize on the TPU scalar unit
    (~6 cycles/element — see the module docstring), so at whole-map winner
    projections it dominates the LT-removert pipeline.  Here each point
    scatter-mins ONE packed int32

        packed = round(range·scale)·16 + (Δrow+1)·4 + (Δcol+1)

    where Δrow/Δcol ∈ {−1,0,+1} locate the point's ``shape`` pixel relative
    to a base derived from its ``proj_shape`` pixel (valid whenever ``shape``
    is no finer than ``proj_shape`` per axis — the removert operating point,
    filter res 2.5 vs reprojection α=3).  The per-proj-pixel minimum then
    carries both the winner's range (fixed-point, resolution 1/scale — pick
    ``scale = 2²⁷/B`` for a range bound B, e.g. ~15 µm at B=2048, far below
    the 0.1 m decision threshold and comparable to f32 ulp at range) and its
    ``shape`` pixel, so the winner image needs only a dense decode plus a
    scatter over the n_proj_pixels — ~2 ops/point total instead of 3, and
    callers that ALSO need the winner mask (static-map visibility) share the
    same pass instead of re-projecting (5 ops → ~2).

    Winner tie-breaking: exact fixed-point range ties resolve by Δ bits then
    by scatter-min determinism — one winner per pixel like the reference's
    ptidx image (``map2RangeImg``, ``utility.cpp:104,137``), minus its data
    race.  Returns ``(win_mask, img_shape_flat)``.
    """
    packed, pix_p = _pack_points(xyz_local, mask, fov, proj_shape, shape, scale)
    n_pix_p = proj_shape[0] * proj_shape[1]
    img_p = jnp.full((n_pix_p,), _PACKED_SENTINEL, jnp.int32)
    img_p = img_p.at[pix_p].min(packed, mode="drop")
    win = mask & (packed == img_p[pix_p])
    img_s = _decode_winner_image(img_p, proj_shape, shape, scale)
    return win, img_s


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "scale"))
def fused_visibility_images(
    source_xyz: jax.Array,          # (M, 3) global
    source_mask: jax.Array,         # (M,)
    pose_inv: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],         # filter-diff image resolution
    proj_shape: Tuple[int, int],    # winner (reprojection) resolution, α=3
    scale: float,
):
    """(visible-from-any-keyframe union mask, (K, nrow*ncol) winner images)
    — the fused replacement for ``sweep_visibility`` + ``projected_scan_images``
    over the same static set (one packed pass per keyframe instead of two
    winner projections; see :func:`packed_winner_image`)."""

    def body(carry, Tinv):
        local = apply_pose(source_xyz, Tinv)
        win, img = packed_winner_image(local, source_mask, fov, proj_shape, shape, scale)
        return carry | win, img

    init = jnp.zeros(source_xyz.shape[:-1], bool)
    return jax.lax.scan(body, init, pose_inv)


def discrepancy_vs_image(
    map_xyz_local: jax.Array,
    map_mask: jax.Array,
    scan_img: jax.Array,            # (nrow*ncol,) precomputed scan range image
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """Per-map-point dynamic mask against a PRECOMPUTED scan range image.

    The map side of :func:`discrepancy_mask`, split out so repeated filter
    passes (ND/PD strong-weak ×3) can reuse one set of per-keyframe scan
    images instead of re-projecting the source session every pass.
    """
    pix, rng, map_img = _project_min(map_xyz_local, map_mask, fov, shape)
    diff_img = (map_img - scan_img) if reverse else (scan_img - map_img)
    flag_img = (diff_img > diff_threshold) & (diff_img < VALID_DIFF_UB)
    # pack (min range, flag) so the per-point pass is a single gather
    packed = jnp.where(flag_img, map_img, -map_img)
    g = packed[pix]
    win = map_mask & (rng <= jnp.abs(g))
    return win & (g > 0)


@partial(jax.jit, static_argnames=("fov", "shape", "reverse"))
def discrepancy_mask(
    map_xyz_local: jax.Array,
    map_mask: jax.Array,
    scan_xyz: jax.Array,
    scan_mask: jax.Array,
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """Per-map-point dynamic mask for one keyframe (both clouds in lidar frame).

    ``reverse=False``: diff = scan − map (self-removert / PD check,
    ``Removerter.cpp:572,459``);  ``reverse=True``: diff = map − scan (ND
    validity check, ``Removerter.cpp:516``).

    Perf note: dynamic-index ops serialize on the TPU scalar unit (~6
    cycles/element), so this kernel is structured to touch the map with
    exactly ONE scatter-min and ONE packed 2-channel gather per keyframe;
    all image-space work (diff, thresholds) is dense VPU arithmetic.
    """
    scan_img = range_image(scan_xyz, scan_mask, fov, shape)
    return discrepancy_vs_image(
        map_xyz_local, map_mask, scan_img, fov, shape, diff_threshold, reverse
    )


@partial(jax.jit, static_argnames=("fov", "shape", "reverse"))
def sweep_discrepancy(
    map_xyz_global: jax.Array,      # (N, 3)
    map_mask: jax.Array,            # (N,)
    scans_xyz: jax.Array,           # (K, S, 3) in each keyframe's lidar frame
    scans_mask: jax.Array,          # (K, S)
    pose_inv: jax.Array,            # (K, 4, 4) lidar_from_global
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """OR over keyframes of :func:`discrepancy_mask` (the map-side removal
    loop ``calcDescrepancyAndParseDynamicPointIdxForEachScan``,
    ``Removerter.cpp:542-593`` — keyframes stream, map stays resident)."""

    def body(carry, inp):
        scan_xyz, scan_mask, Tinv = inp
        local = apply_pose(map_xyz_global, Tinv)
        dyn = discrepancy_mask(
            local, map_mask, scan_xyz, scan_mask, fov, shape, diff_threshold, reverse
        )
        return carry | dyn, None

    init = jnp.zeros(map_xyz_global.shape[:-1], bool)
    out, _ = jax.lax.scan(body, init, (scans_xyz, scans_mask, pose_inv))
    return out


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape"))
def projected_scan_images(
    source_xyz: jax.Array,          # (M, 3) global
    source_mask: jax.Array,         # (M,)
    pose_inv: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],         # image resolution for the diff pass
    proj_shape: Tuple[int, int],    # winner (reprojection) resolution, α=3
) -> jax.Array:
    """(K, nrow*ncol) range images of the projected static scans.

    Per keyframe: source points that win their pixel at ``proj_shape`` form
    the projected scan (``parseScansViaProjection``), scattered-min into an
    image at ``shape``.  Computed ONCE and reused by every strong-weak
    filter repeat via :func:`sweep_discrepancy_vs_images` — the source-side
    transform + two scatters are the dominant cost of the filter stage.
    """

    def body(_, Tinv):
        src_local = apply_pose(source_xyz, Tinv)
        swin, *_ = winner_mask(src_local, source_mask, fov, proj_shape)
        return None, range_image(src_local, swin, fov, shape)

    _, imgs = jax.lax.scan(body, None, pose_inv)
    return imgs


@partial(jax.jit, static_argnames=("fov", "shape", "reverse"))
def sweep_discrepancy_vs_images(
    target_xyz: jax.Array,          # (N, 3) global
    target_mask: jax.Array,
    scan_imgs: jax.Array,           # (K, nrow*ncol) from projected_scan_images
    pose_inv: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """OR over keyframes of :func:`discrepancy_vs_image` — the per-repeat
    half of :func:`sweep_discrepancy_projected` (target side only)."""

    def body(carry, inp):
        img, Tinv = inp
        tgt_local = apply_pose(target_xyz, Tinv)
        dyn = discrepancy_vs_image(
            tgt_local, target_mask, img, fov, shape, diff_threshold, reverse
        )
        return carry | dyn, None

    init = jnp.zeros(target_xyz.shape[:-1], bool)
    out, _ = jax.lax.scan(body, init, (scan_imgs, pose_inv))
    return out


@partial(jax.jit, static_argnames=("fov", "shape", "proj_shape", "reverse"))
def sweep_discrepancy_projected(
    target_xyz: jax.Array,          # (N, 3) global — the map being partitioned
    target_mask: jax.Array,
    source_xyz: jax.Array,          # (M, 3) global — the "scanning" session's map
    source_mask: jax.Array,
    pose_inv: jax.Array,            # (K, 4, 4) source keyframe lidar_from_global
    fov: Tuple[float, float],
    shape: Tuple[int, int],         # partition resolution (e.g. x2.5)
    proj_shape: Tuple[int, int],    # projected-scan resolution (e.g. x3.0)
    diff_threshold: float = 0.1,
    reverse: bool = False,
) -> jax.Array:
    """ND/PD strong-weak filtering core.

    The reference filters delta maps against the *projected static scans* of
    the other session (``keyframe_scans_static_projected_``; used by
    ``calcDescrepancyAndParseDynamicPointIdxForEachScanFor{ND,PD}``,
    ``Removerter.cpp:429-540``).  Here the projected scan of keyframe k is
    derived on the fly: source-map points that win their pixel at the
    reprojection resolution (α=3, ``Session.h:13``) form the scan, whose
    range image at the partition resolution is compared against the target
    (delta) map.  OR-reduced over keyframes.
    """

    def body(carry, Tinv):
        tgt_local = apply_pose(target_xyz, Tinv)
        src_local = apply_pose(source_xyz, Tinv)
        swin, *_ = winner_mask(src_local, source_mask, fov, proj_shape)
        dyn = discrepancy_mask(
            tgt_local, target_mask, src_local, swin, fov, shape, diff_threshold, reverse
        )
        return carry | dyn, None

    init = jnp.zeros(target_xyz.shape[:-1], bool)
    out, _ = jax.lax.scan(body, init, pose_inv)
    return out


@partial(jax.jit, static_argnames=("fov", "shape"))
def sweep_visibility(
    map_xyz_global: jax.Array,
    map_mask: jax.Array,
    pose_inv: jax.Array,            # (K, 4, 4)
    fov: Tuple[float, float],
    shape: Tuple[int, int],
) -> jax.Array:
    """OR over keyframes of the winner mask: map points visible from at least
    one keyframe at this resolution (the reprojection used by
    ``parseScansViaProjection``, ``ltremovert/src/Session.cpp:348-360``)."""

    def body(carry, Tinv):
        local = apply_pose(map_xyz_global, Tinv)
        win, *_ = winner_mask(local, map_mask, fov, shape)
        return carry | win, None

    init = jnp.zeros(map_xyz_global.shape[:-1], bool)
    out, _ = jax.lax.scan(body, init, pose_inv)
    return out
