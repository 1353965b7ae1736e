"""LT-SLAM retrieval parity vs the reference-faithful f64 oracle.

Closes the slam-side gap of VERDICT r4 "Next" #6: ``ref_oracle_slam.py`` is
a literal NumPy reimplementation of the reference's Scan Context loop
retrieval chain (``detectLoopClosureIDBetweenSession``,
``Scancontext.cpp:263-324``, driven per ``LTslam::detectInterSessionSCloops``,
``LTslam.cpp:304-333``); these tests assert ltm's accepted loop-pair set
(and each loop's shift/yaw) matches it on bench-generator fixtures.

The literal oracle is per-point/per-pair Python (slow by design); a
vectorized f64 twin is first proven equal to it on a small survey, then
carries the larger fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

from ltm.io.synthetic import make_two_sessions
from ltm.kernels import polar_bin
from ltm.retrieval import scancontext as sc_retrieval

import ref_oracle_slam as oracle


# ---------------------------------------------------------------------------
# vectorized f64 twin of the literal oracle (for larger fixtures)
# ---------------------------------------------------------------------------

def make_scancontext_vec(pts: np.ndarray) -> np.ndarray:
    """Vectorized ``makeScancontext`` — bit-equal to the literal loop
    (asserted below): same ceil-and-clamp bin rule, f64 throughout."""
    p = np.asarray(pts, np.float64)
    x, y = p[:, 0], p[:, 1]
    z = p[:, 2] + oracle.LIDAR_HEIGHT
    r = np.sqrt(x * x + y * y)
    keep = r <= oracle.MAX_RADIUS
    theta = np.degrees(np.arctan2(y, x)) % 360.0
    ring = np.clip(np.ceil(r / oracle.MAX_RADIUS * oracle.NUM_RING),
                   1, oracle.NUM_RING).astype(np.int64) - 1
    sect = np.clip(np.ceil(theta / 360.0 * oracle.NUM_SECTOR),
                   1, oracle.NUM_SECTOR).astype(np.int64) - 1
    desc = np.full((oracle.NUM_RING, oracle.NUM_SECTOR), -np.inf)
    np.maximum.at(desc, (ring[keep], sect[keep]), z[keep])
    desc[~np.isfinite(desc)] = 0.0
    return desc


def detect_loops_vec(source_scans, target_scans):
    """``detect_inter_session_loops`` with the vectorized descriptor and a
    vectorized candidate/distance evaluation — same decisions, f64."""
    S = oracle.NUM_SECTOR
    tgt = np.stack([make_scancontext_vec(s) for s in target_scans])
    src = np.stack([make_scancontext_vec(s) for s in source_scans])
    tgt_keys = tgt.mean(axis=2)
    src_keys = src.mean(axis=2)
    # column-normalized stacks for the cosine distance
    def norm_cols(d):
        n = np.linalg.norm(d, axis=1)           # (K, S)
        nz = n > 0
        dn = np.where(nz[:, None, :], d / np.maximum(n[:, None, :], 1e-300), 0.0)
        return dn, nz
    tn, tnz = norm_cols(tgt)
    radius = int(round(0.5 * oracle.SEARCH_RATIO * S))

    sc_pairs, rs_misses, shifts = [], [], {}
    v_src = src.mean(axis=1)                     # (Q, S) sector keys
    v_tgt = tgt.mean(axis=1)                     # (T, S)
    for q in range(src.shape[0]):
        d2 = np.sum((tgt_keys - src_keys[q]) ** 2, axis=1)
        cand = np.argsort(d2, kind="stable")[:oracle.NUM_CANDIDATES]
        qn, qnz = norm_cols(src[q:q + 1])
        qn, qnz = qn[0], qnz[0]
        best = (1e7, 0, 0)                       # (dist, shift, idx)
        for ci in cand:
            # vkey pre-align over all shifts
            vd = [np.linalg.norm(v_src[q] - np.roll(v_tgt[ci], s)) for s in range(S)]
            v_shift = int(np.argmin(vd))
            space = {v_shift}
            for ii in range(1, radius + 1):
                space.add((v_shift + ii) % S)
                space.add((v_shift - ii) % S)
            for s in sorted(space):
                t_sh = np.roll(tn[ci], s, axis=1)
                t_nz = np.roll(tnz[ci], s)
                both = qnz & t_nz
                n_eff = int(both.sum())
                if n_eff == 0:
                    continue
                sim = float(np.sum(qn[:, both] * t_sh[:, both]))
                d = 1.0 - sim / n_eff
                if d < best[0]:
                    best = (d, s, int(ci))
        shifts[q] = best[1]
        if best[0] < oracle.SC_DIST_THRES:
            sc_pairs.append((best[2], q))
        else:
            rs_misses.append(q)
    return sc_pairs, rs_misses, shifts


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _bundle(n_kf, pts):
    return make_two_sessions(seed=11, num_keyframes=n_kf, num_cars=12,
                             num_changed=4, max_scan_points=pts,
                             scan_range=70.0, odom_noise=5e-4)


def _ltm_loops(central_scans, query_scans):
    """ltm's retrieval on the same scans (the _detect_sc_loops chain minus
    ICP: descriptors -> batched distance -> candidate gate -> threshold)."""
    import jax.numpy as jnp

    def pad(scans):
        cap = 1 << int(max(len(s) for s in scans) - 1).bit_length()
        xyz = np.zeros((len(scans), cap, 3), np.float32)
        msk = np.zeros((len(scans), cap), bool)
        for i, s in enumerate(scans):
            xyz[i, :len(s)] = s[:, :3]
            msk[i, :len(s)] = True
        return jnp.asarray(xyz), jnp.asarray(msk)

    t_xyz, t_msk = pad(central_scans)
    q_xyz, q_msk = pad(query_scans)
    t_desc = polar_bin.make_descriptors(t_xyz, t_msk)
    q_desc = polar_bin.make_descriptors(q_xyz, q_msk)
    ones_q = jnp.ones((q_desc.shape[0],), bool)
    ones_t = jnp.ones((t_desc.shape[0],), bool)
    loop_idx, dist, yaw = sc_retrieval.detect_loops_between_sessions(
        q_desc, ones_q, t_desc, ones_t)
    return np.asarray(loop_idx), np.asarray(dist), np.asarray(yaw)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_vectorized_oracle_matches_literal():
    """The vectorized f64 twin is decision- and shift-identical to the
    literal per-point reimplementation on a small survey."""
    b = _bundle(24, 2500)
    src = [s[:, :3] for s in b["query"].data.scans]
    tgt = [s[:, :3] for s in b["central"].data.scans]
    lit_pairs, lit_miss, lit_yaws, _ = oracle.detect_inter_session_loops(src, tgt)
    vec_pairs, vec_miss, vec_shifts = detect_loops_vec(src, tgt)
    assert lit_pairs == vec_pairs
    assert lit_miss == vec_miss
    for q, s in vec_shifts.items():
        assert abs(lit_yaws[q] - np.deg2rad(s * 6.0)) < 1e-12
    # descriptors bit-equal too
    for s in (src[0], tgt[-1]):
        np.testing.assert_array_equal(
            oracle.make_scancontext(s), make_scancontext_vec(s))


def test_ltm_retrieval_matches_oracle():
    """ltm's accepted loop-pair set == the reference algorithm's on a
    bench-generator two-session survey (VERDICT r4 #6 'done' criterion)."""
    b = _bundle(150, 4000)
    src = [s[:, :3] for s in b["query"].data.scans]
    tgt = [s[:, :3] for s in b["central"].data.scans]
    o_pairs, o_miss, o_shifts = detect_loops_vec(src, tgt)
    loop_idx, dist, yaw = _ltm_loops(tgt, src)

    l_pairs = [(int(loop_idx[q]), q) for q in range(len(src)) if loop_idx[q] >= 0]
    l_miss = [q for q in range(len(src)) if loop_idx[q] < 0]
    # non-vacuous: the fixture exercises BOTH outcomes (146 loops / 4 misses)
    assert len(o_pairs) > 100 and len(o_miss) > 0
    assert l_pairs == o_pairs
    assert l_miss == o_miss
    shift_l = np.rint(yaw / (2 * np.pi / 60)).astype(int) % 60
    for tgt_i, q in o_pairs:
        assert shift_l[q] == o_shifts[q], (q, shift_l[q], o_shifts[q])


@pytest.mark.slow
def test_ltm_retrieval_matches_oracle_bench_fixture():
    """Same assertion on the exact BENCH fixture (500 kf x 8000 pts —
    the operating point BENCH_r*.json records)."""
    b = _bundle(500, 8000)
    src = [s[:, :3] for s in b["query"].data.scans]
    tgt = [s[:, :3] for s in b["central"].data.scans]
    o_pairs, o_miss, _ = detect_loops_vec(src, tgt)
    loop_idx, _, _ = _ltm_loops(tgt, src)
    l_pairs = [(int(loop_idx[q]), q) for q in range(len(src)) if loop_idx[q] >= 0]
    l_miss = [q for q in range(len(src)) if loop_idx[q] < 0]
    assert l_pairs == o_pairs
    assert l_miss == o_miss
