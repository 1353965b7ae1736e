"""Reference-faithful NumPy/f64 oracle of the LT-SLAM loop RETRIEVAL chain.

Deliberately LITERAL reimplementation of the reference's Scan Context
detection path, written line-against-line from ``/root/reference/ltslam``
(same role for the slam side as ``ref_oracle.py`` plays for removert —
VERDICT r4 "Next" #6):

  * ``make_scancontext``      — ``SCManager::makeScancontext``
                                (``src/Scancontext.cpp:151-195``) incl. the
                                exact ceil-and-clamp bin rule, ``xy2theta``
                                (``:23-37``) and the NO_POINT -> 0 reset;
  * ``ring_key``/``sector_key`` — row/column means (``:197-226``);
  * ``dist_direct_sc``        — column-cosine distance over mutually
                                non-empty columns (``:69-90``);
  * ``fast_align_using_vkey`` — full-shift sector-key argmin (``:93-113``);
  * ``distance_btn_scan_context`` — vkey pre-align + ±10% shift window
                                (``:116-148``);
  * ``detect_loop_between_session`` — ring-key 3-NN candidates + best
                                distance + 0.3 threshold
                                (``detectLoopClosureIDBetweenSession``,
                                ``:263-324``; the nanoflann kd-tree is an
                                EXACT kNN, reproduced brute-force);
  * ``detect_inter_session_loops`` — the per-source-node loop/miss split of
                                ``LTslam::detectInterSessionSCloops``
                                (``src/LTslam.cpp:304-333``).

All arithmetic is float64 (the reference is double throughout except the
nanoflann ring keys, which it narrows to float).  Test-only: imported by
nothing in ``ltm/``.
"""

from __future__ import annotations

import numpy as np

NUM_RING = 20          # Scancontext.h:86
NUM_SECTOR = 60        # Scancontext.h:87
MAX_RADIUS = 80.0      # Scancontext.h:88
LIDAR_HEIGHT = 2.0     # utility file kLidarHeight / our config default
NUM_CANDIDATES = 3     # Scancontext.h:94
SEARCH_RATIO = 0.1     # Scancontext.h:97
SC_DIST_THRES = 0.3    # Scancontext.h:99


def xy2theta(x: float, y: float) -> float:
    """``xy2theta`` (Scancontext.cpp:23-37): quadrant-wise atan in degrees."""
    if x >= 0 and y >= 0:
        return (180 / np.pi) * np.arctan(y / x) if x != 0 else 90.0
    if x < 0 and y >= 0:
        return 180 - (180 / np.pi) * np.arctan(y / (-x))
    if x < 0 and y < 0:
        return 180 + (180 / np.pi) * np.arctan(y / x)
    return 360 - (180 / np.pi) * np.arctan((-y) / x) if x != 0 else 270.0


def make_scancontext(pts: np.ndarray,
                     num_ring: int = NUM_RING, num_sector: int = NUM_SECTOR,
                     max_radius: float = MAX_RADIUS,
                     lidar_height: float = LIDAR_HEIGHT) -> np.ndarray:
    """``makeScancontext`` (Scancontext.cpp:151-195): per-bin max z."""
    NO_POINT = -1000.0
    desc = np.full((num_ring, num_sector), NO_POINT, np.float64)
    for p in np.asarray(pts, np.float64):
        x, y = p[0], p[1]
        z = p[2] + lidar_height
        azim_range = np.sqrt(x * x + y * y)
        if azim_range > max_radius:
            continue
        azim_angle = xy2theta(x, y)
        ring_idx = max(min(num_ring, int(np.ceil((azim_range / max_radius) * num_ring))), 1)
        sctor_idx = max(min(num_sector, int(np.ceil((azim_angle / 360.0) * num_sector))), 1)
        if desc[ring_idx - 1, sctor_idx - 1] < z:
            desc[ring_idx - 1, sctor_idx - 1] = z
    desc[desc == NO_POINT] = 0.0
    return desc


def ring_key(desc: np.ndarray) -> np.ndarray:
    """``makeRingkeyFromScancontext`` (Scancontext.cpp:197-210)."""
    return desc.mean(axis=1)


def sector_key(desc: np.ndarray) -> np.ndarray:
    """``makeSectorkeyFromScancontext`` (Scancontext.cpp:213-226)."""
    return desc.mean(axis=0)


def circshift(mat: np.ndarray, num_shift: int) -> np.ndarray:
    """``circshift`` (Scancontext.cpp:39-59): columns shift RIGHT."""
    return np.roll(mat, num_shift, axis=1)


def dist_direct_sc(sc1: np.ndarray, sc2: np.ndarray) -> float:
    """``distDirectSC`` (Scancontext.cpp:69-90)."""
    num_eff_cols = 0
    sum_sim = 0.0
    for c in range(sc1.shape[1]):
        c1, c2 = sc1[:, c], sc2[:, c]
        n1, n2 = np.linalg.norm(c1), np.linalg.norm(c2)
        if n1 == 0 or n2 == 0:
            continue
        sum_sim += float(np.dot(c1, c2) / (n1 * n2))
        num_eff_cols += 1
    if num_eff_cols == 0:
        return 1.0  # no overlapping sectors: maximally distant (ref: 0/0)
    return 1.0 - sum_sim / num_eff_cols


def fast_align_using_vkey(v1: np.ndarray, v2: np.ndarray) -> int:
    """``fastAlignUsingVkey`` (Scancontext.cpp:93-113)."""
    best_shift, best_norm = 0, 1e7
    for s in range(v1.shape[0]):
        d = float(np.linalg.norm(v1 - np.roll(v2, s)))
        if d < best_norm:
            best_shift, best_norm = s, d
    return best_shift


def distance_btn_scan_context(sc1: np.ndarray, sc2: np.ndarray):
    """``distanceBtnScanContext`` (Scancontext.cpp:116-148) ->
    (min_dist, argmin_shift)."""
    S = sc1.shape[1]
    v_shift = fast_align_using_vkey(sector_key(sc1), sector_key(sc2))
    radius = int(round(0.5 * SEARCH_RATIO * S))
    space = {v_shift}
    for ii in range(1, radius + 1):
        space.add((v_shift + ii) % S)
        space.add((v_shift - ii) % S)
    argmin_shift, min_dist = 0, 1e7
    for s in sorted(space):
        d = dist_direct_sc(sc1, circshift(sc2, s))
        if d < min_dist:
            argmin_shift, min_dist = s, d
    return min_dist, argmin_shift


def detect_loop_between_session(curr_key: np.ndarray, curr_desc: np.ndarray,
                                target_keys: np.ndarray,
                                target_descs: np.ndarray):
    """``detectLoopClosureIDBetweenSession`` (Scancontext.cpp:263-324) ->
    (loop_id or -1, yaw_rad, min_dist).  The kd-tree kNN is exact —
    brute-force L2 on the ring keys gives the same candidate set."""
    d2 = np.sum((target_keys - curr_key[None, :]) ** 2, axis=1)
    cand = np.argsort(d2, kind="stable")[:NUM_CANDIDATES]
    min_dist, nn_align, nn_idx = 1e7, 0, 0
    for ci in cand:
        d, align = distance_btn_scan_context(curr_desc, target_descs[ci])
        if d < min_dist:
            min_dist, nn_align, nn_idx = d, align, int(ci)
    loop_id = nn_idx if min_dist < SC_DIST_THRES else -1
    yaw = np.deg2rad(nn_align * (360.0 / curr_desc.shape[1]))
    return loop_id, yaw, min_dist


def detect_inter_session_loops(source_scans, target_scans):
    """``LTslam::detectInterSessionSCloops`` (LTslam.cpp:304-333): every
    source node queries the target database; hits become SC loop pairs
    (target_idx, source_idx), misses become RS candidates.

    Returns (sc_pairs, rs_misses, yaws, dists)."""
    tgt_descs = np.stack([make_scancontext(s) for s in target_scans])
    tgt_keys = np.stack([ring_key(d) for d in tgt_descs])
    sc_pairs, rs_misses, yaws, dists = [], [], {}, {}
    for s_idx, scan in enumerate(source_scans):
        desc = make_scancontext(scan)
        loop_id, yaw, dist = detect_loop_between_session(
            ring_key(desc), desc, tgt_keys, tgt_descs)
        yaws[s_idx] = yaw
        dists[s_idx] = dist
        if loop_id == -1:
            rs_misses.append(s_idx)
        else:
            sc_pairs.append((loop_id, s_idx))
    return sc_pairs, rs_misses, yaws, dists
