"""Reference-faithful f64 NumPy oracle of the LT-removert detector.

A slow, deliberately LITERAL reimplementation of the reference algorithm,
written line-against-line from ``/root/reference/ltremovert`` — including its
quirks (the ptidx==0 winner drop in ``parseProjectedPoints``, the per-stage
0.05 m octree re-dedupe, the voxel-then-preclean prep order).  It exists for
ONE purpose: to measure the IoU between ltm's detected ND/PD/strong/weak
point sets and what the *reference algorithm* detects on the same inputs —
the parity metric as BASELINE.json words it ("reproduce its PD/ND point
sets, IoU >= 0.95 vs reference"), independent of world ground truth.

Reference map (all cited against /root/reference/ltremovert):
  prep          loadKeyframes (VoxelGrid centroid)    src/Session.cpp:266-302
                precleaningKeyframes                  src/Session.cpp:506-533
                makeGlobalMap + octreeDownsampling    src/Removerter.cpp:213-252,
                                                      src/utility.cpp:204-219
  range images  scan2RangeImg                         src/Removerter.cpp:109-156
                map2RangeImg (+ptidx, 0 = no point)   src/utility.cpp:92-142
                resetRimgSize                         src/utility.cpp:222-236
  HD removal    removeOnce / partitionCurrentMap      src/Removerter.cpp:801-905
                calcDescrepancyAndParseDynamicPointIdx[ForEachScan]
                                                      src/Removerter.cpp:381-413,542-593
  projection    parseStaticScansViaProjection /
                parseProjectedPoints (skips ptidx==0) src/utility.cpp:74-89,
                                                      src/Session.cpp:305-346
  kNN diff      extractLowDynPointsViaKnnDiff /
                partitionLowDynamicPointsOfScanByKnn  src/Session.cpp:393-427,537-607
  strong/weak   filterStrongND (3x reversed diff) /
                filterStrongPD (3x forward diff)      src/Removerter.cpp:831-880,1395-1411
                removeWeakNDMapPointsHavingStrongNDInNear
                                                      src/Session.cpp:452-484
  composition   updateCurrentMap                      src/Removerter.cpp:1483-1524
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

K_FLAG_NO_POINT = 10000.0     # utility.h:93
K_VALID_DIFF_UPPER = 200.0    # utility.h:94
DEDUPE_VOXEL = 0.05           # hard-coded at every re-dedupe site


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def voxel_centroid(pts: np.ndarray, leaf: float) -> np.ndarray:
    """Voxel-centroid downsample (PCL VoxelGrid / OctreePointCloudVoxelCentroid
    both average the points of each occupied cell; grid anchoring differences
    are sub-voxel and irrelevant to the set-IoU comparison)."""
    if len(pts) == 0:
        return pts.reshape(0, 3)
    idx = np.floor(pts / leaf).astype(np.int64)
    uniq, inv = np.unique(idx, axis=0, return_inverse=True)
    sums = np.zeros((len(uniq), 3))
    np.add.at(sums, inv, pts)
    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    return sums / cnt[:, None]


def preclean(pts: np.ndarray, radius: float, z_band: float) -> np.ndarray:
    """precleaningKeyframes: drop (range < radius) & (|z| < z_band)
    (Session.cpp:506-533; the & chain parses as logical and)."""
    r = np.linalg.norm(pts, axis=1)
    drop = (r < radius) & (np.abs(pts[:, 2]) < z_band)
    return pts[~drop]


def rimg_shape(fov, alpha):
    """resetRimgSize (utility.cpp:222-236)."""
    return int(round(fov[0] * alpha)), int(round(fov[1] * alpha))


def _pixel_of(pts: np.ndarray, fov, shape):
    """Bit-matched pixel rule (Removerter.cpp:137-138): row/col = round of
    normalized elevation/azimuth, clamped to the image."""
    vfov, hfov = fov
    rows, cols = shape
    az = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    el = np.degrees(np.arctan2(pts[:, 2], np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)))
    r = np.linalg.norm(pts, axis=1)
    row = np.clip(np.round(rows * (1.0 - (el + vfov / 2.0) / vfov)), 0, rows - 1).astype(np.int64)
    col = np.clip(np.round(cols * ((az + hfov / 2.0) / hfov)), 0, cols - 1).astype(np.int64)
    return row * cols + col, r


def scan_range_image(scan_local: np.ndarray, fov, shape) -> np.ndarray:
    """scan2RangeImg (Removerter.cpp:109-156): scatter-min range, flat (P,)."""
    n_pix = shape[0] * shape[1]
    img = np.full(n_pix, K_FLAG_NO_POINT)
    if len(scan_local) == 0:
        return img
    pix, r = _pixel_of(scan_local, fov, shape)
    np.minimum.at(img, pix, r)
    return img


def map_range_image(map_local: np.ndarray, fov, shape):
    """map2RangeImg (utility.cpp:92-142): (range image, winner ptidx image);
    ptidx 0 doubles as 'no point' — the reference quirk is preserved by the
    callers below."""
    n_pix = shape[0] * shape[1]
    img = np.full(n_pix, K_FLAG_NO_POINT)
    ptidx = np.zeros(n_pix, np.int64)
    if len(map_local) == 0:
        return img, ptidx
    pix, r = _pixel_of(map_local, fov, shape)
    order = np.lexsort((np.arange(len(pix)), r, pix))
    first = np.ones(len(order), bool)
    first[1:] = pix[order][1:] != pix[order][:-1]
    win = order[first]
    img[pix[win]] = r[win]
    ptidx[pix[win]] = win
    return img, ptidx


def _transform(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


# ---------------------------------------------------------------------------
# the detector
# ---------------------------------------------------------------------------

class OracleSession:
    def __init__(self, scans, poses, cfg):
        lidar2base = np.asarray(cfg.extrinsic_lidar_to_base, np.float64).reshape(4, 4)
        self.poses = [np.asarray(p, np.float64) @ lidar2base for p in poses]
        self.inv_poses = [np.linalg.inv(p) for p in self.poses]
        # loadKeyframes: VoxelGrid, THEN precleaningKeyframes (run() order,
        # Removerter.cpp:1653-1678)
        self.scans = []
        for s in scans:
            s = voxel_centroid(np.asarray(s, np.float64)[:, :3], cfg.downsample_voxel_size)
            self.scans.append(preclean(s, cfg.preclean_radius, cfg.preclean_z_band))
        # makeGlobalMap (Removerter.cpp:213-252)
        merged = np.concatenate([
            _transform(T, s) for T, s in zip(self.poses, self.scans)
        ]) if self.scans else np.zeros((0, 3))
        self.map_global = voxel_centroid(merged, cfg.downsample_voxel_size)
        self.static_map = self.map_global           # set by HD removal
        self.proj_static_local = None               # per-kf winner scans
        self.coexist_local = None
        self.diff_local = None


def _discrepancy_ids(target_map, source_scans_local, source_inv_poses, fov,
                     alpha, diff_thres, reverse):
    """calcDescrepancyAndParseDynamicPointIdxForEachScan[ForND/ForPD]
    (Removerter.cpp:542-593, 415-516): union of flagged winner ids over the
    source keyframes; forward diff = scan − map, reversed = map − scan."""
    shape = rimg_shape(fov, alpha)
    flagged = set()
    for scan_local, inv_pose in zip(source_scans_local, source_inv_poses):
        scan_img = scan_range_image(scan_local, fov, shape)
        map_local = _transform(inv_pose, target_map)
        map_img, ptidx = map_range_image(map_local, fov, shape)
        diff = (map_img - scan_img) if reverse else (scan_img - map_img)
        hit = (diff < K_VALID_DIFF_UPPER) & (diff > diff_thres)
        flagged.update(ptidx[hit].tolist())
    return flagged


def _partition_by_ids(map_pts, flagged_ids):
    dyn = np.zeros(len(map_pts), bool)
    if flagged_ids:
        dyn[np.fromiter(flagged_ids, np.int64)] = True
    return map_pts[~dyn], map_pts[dyn]


def _project_scans(map_global, sessions_poses_inv, fov, alpha):
    """parseScansViaProjection (Session.cpp:348-360): per keyframe, the
    winner map points at the reprojection resolution, LOCAL coords; the
    reference's ptidx==0 sentinel drops the winner of pixel slot 0
    (parseProjectedPoints, utility.cpp:74-89) — preserved."""
    shape = rimg_shape(fov, alpha)
    out = []
    for inv_pose in sessions_poses_inv:
        map_local = _transform(inv_pose, map_global)
        _, ptidx = map_range_image(map_local, fov, shape)
        ids = ptidx[ptidx != 0]
        out.append(map_local[ids])
    return out


def _knn_partition(scans_local, poses, inv_poses, target_map, k, thr):
    """partitionLowDynamicPointsOfScanByKnn (Session.cpp:537-607): per scan
    point, mean of k nearest SQUARED distances to the target map ≷ thr."""
    coexist, diff = [], []
    tree = cKDTree(target_map) if len(target_map) else None
    for scan_local, pose, inv_pose in zip(scans_local, poses, inv_poses):
        if len(scan_local) == 0 or tree is None:
            coexist.append(np.zeros((0, 3)))
            diff.append(scan_local.copy())
            continue
        pts_g = _transform(pose, scan_local)
        d, _ = tree.query(pts_g, k=min(k, len(target_map)))
        d = d.reshape(len(pts_g), -1)
        avg_sq = np.mean(d ** 2, axis=1)
        is_coex = avg_sq < thr
        coexist.append(scan_local[is_coex])
        diff.append(scan_local[~is_coex])
    return coexist, diff


def _merge_global(scans_local, poses, voxel=DEDUPE_VOXEL):
    pts = [(_transform(T, s)) for T, s in zip(poses, scans_local) if len(s)]
    merged = np.concatenate(pts) if pts else np.zeros((0, 3))
    return voxel_centroid(merged, voxel)


def oracle_run(central_scans, central_poses, query_scans, query_poses, cfg):
    """The full reference detector (Removerter::run steps 0-3 minus savers,
    Removerter.cpp:1653-1678).  Returns named GLOBAL point sets."""
    fov = (cfg.vfov, cfg.hfov)
    c = OracleSession(central_scans, central_poses, cfg)
    q = OracleSession(query_scans, query_poses, cfg)

    # ---- Step 1: HD removal (removeHighDynamicPoints, :1580-1604) --------
    for s in (c, q):
        m = s.map_global
        for res in cfg.remove_resolution_list:
            ids = _discrepancy_ids(m, s.scans, s.inv_poses, fov, res,
                                   cfg.diff_threshold, reverse=False)
            static, _ = _partition_by_ids(m, ids)
            m = voxel_centroid(static, DEDUPE_VOXEL)   # removeOnce :894-896
        s.static_map = m
        s.proj_static_local = _project_scans(m, s.inv_poses, fov,
                                             cfg.reprojection_alpha)

    # ---- Step 2: LD detection (detectLowDynamicPoints, :1413-1481) -------
    c.coexist_local, c.diff_local = _knn_partition(
        c.proj_static_local, c.poses, c.inv_poses, q.static_map,
        cfg.num_knn_points, cfg.knn_avg_sqdist_threshold)
    q.coexist_local, q.diff_local = _knn_partition(
        q.proj_static_local, q.poses, q.inv_poses, c.static_map,
        cfg.num_knn_points, cfg.knn_avg_sqdist_threshold)

    nd_map = _merge_global(c.diff_local, c.poses)      # constructGlobalNDMap
    pd_map = _merge_global(q.diff_local, q.poses)      # constructGlobalPDMap
    pd_orig = pd_map.copy()

    # filterStrongND: 3x iremoveOnceForND with REVERSED diff, source = the
    # cleaner session's projected static scans (:831-854, 1403-1411)
    nd_cur, nd_weak = nd_map, np.zeros((0, 3))
    for _ in range(cfg.nd_pd_filter_repeats):
        ids = _discrepancy_ids(nd_cur, q.proj_static_local, q.inv_poses, fov,
                               cfg.nd_pd_filter_resolution, 0.1, reverse=True)
        static, dyn = _partition_by_ids(nd_cur, ids)
        nd_cur = voxel_centroid(static, DEDUPE_VOXEL)
        nd_weak = voxel_centroid(np.concatenate([nd_weak, dyn]), DEDUPE_VOXEL)
    nd_strong = nd_cur

    # removeWeakNDMapPointsHavingStrongNDInNear (Session.cpp:452-484)
    if len(nd_strong) and len(nd_weak):
        tree = cKDTree(nd_strong)
        d, _ = tree.query(nd_weak, k=min(2, len(nd_strong)))
        avg_sq = np.mean(d.reshape(len(nd_weak), -1) ** 2, axis=1)
        promote = avg_sq < cfg.weak_to_strong_sqdist_threshold
        nd_strong = np.concatenate([nd_strong, nd_weak[promote]])
        nd_weak = nd_weak[~promote]

    # filterStrongPD: 3x removeOnceForPD with FORWARD diff, source = the
    # central session's projected static scans (:856-880, 1395-1401);
    # revertStrongPDMapPointsHavingWeakPDInNear is the reference's no-op
    pd_cur, pd_weak = pd_map, np.zeros((0, 3))
    for _ in range(cfg.nd_pd_filter_repeats):
        ids = _discrepancy_ids(pd_cur, c.proj_static_local, c.inv_poses, fov,
                               cfg.nd_pd_filter_resolution, 0.1, reverse=False)
        static, dyn = _partition_by_ids(pd_cur, ids)
        pd_cur = voxel_centroid(static, DEDUPE_VOXEL)
        pd_weak = voxel_centroid(np.concatenate([pd_weak, dyn]), DEDUPE_VOXEL)
    pd_strong = pd_cur

    # ---- Step 3: LT-map composition (updateCurrentMap, :1483-1524) -------
    union_q = _merge_global(q.coexist_local, q.poses)
    union_c = _merge_global(c.coexist_local, c.poses)
    updated = np.concatenate([union_q, union_c, nd_weak, pd_orig])
    updated = voxel_centroid(updated, DEDUPE_VOXEL)
    updated_strong = voxel_centroid(
        np.concatenate([union_q, union_c, nd_weak, pd_strong]), DEDUPE_VOXEL)

    return {
        "static_c": c.static_map,
        "static_q": q.static_map,
        "nd": nd_map,
        "pd": pd_orig,
        "nd_strong": nd_strong,
        "nd_weak": nd_weak,
        "pd_strong": pd_strong,
        "pd_weak": pd_weak,
        "updated": updated,
        "updated_strong": updated_strong,
    }


# ---------------------------------------------------------------------------
# comparison metric
# ---------------------------------------------------------------------------

def set_iou(a: np.ndarray, b: np.ndarray, tol: float = 0.06) -> float:
    """Soft Jaccard between two point sets: a point counts as shared when the
    other set has a point within ``tol`` (covers centroid-vs-representative
    and f32-vs-f64 jitter, far below the 0.28 m detection radius)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    ta, tb = cKDTree(a), cKDTree(b)
    ma = float((tb.query(a)[0] <= tol).sum())
    mb = float((ta.query(b)[0] <= tol).sum())
    inter = 0.5 * (ma + mb)
    return inter / (len(a) + len(b) - inter)
