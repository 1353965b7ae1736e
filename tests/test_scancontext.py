import jax.numpy as jnp
import numpy as np

from ltm.kernels import polar_bin
from ltm.retrieval import scancontext as sc


# ------------------------------------------------------------ numpy oracles

def np_circshift(mat, s):
    out = np.zeros_like(mat)
    S = mat.shape[1]
    for j in range(S):
        out[:, (j + s) % S] = mat[:, j]
    return out


def np_dist_direct(sc1, sc2):
    num_eff = 0
    total = 0.0
    for j in range(sc1.shape[1]):
        c1, c2 = sc1[:, j], sc2[:, j]
        n1, n2 = np.linalg.norm(c1), np.linalg.norm(c2)
        if n1 == 0 or n2 == 0:
            continue
        total += c1 @ c2 / (n1 * n2)
        num_eff += 1
    if num_eff == 0:
        return 1e9
    return 1.0 - total / num_eff


def np_distance_btn(sc1, sc2, search_ratio=0.1, full=False):
    S = sc1.shape[1]
    if full:
        space = list(range(S))
    else:
        vk1 = sc1.mean(0)
        vk2 = sc2.mean(0)
        vdiffs = [np.linalg.norm(vk1 - np_circshift(vk2[None], s)[0]) for s in range(S)]
        s0 = int(np.argmin(vdiffs))
        radius = round(0.5 * search_ratio * S)
        space = sorted({(s0 + d) % S for d in range(-radius, radius + 1)})
    best = (1e9, 0)
    for s in space:
        d = np_dist_direct(sc1, np_circshift(sc2, s))
        if d < best[0]:
            best = (d, s)
    return best


def random_descs(rng, k, R=20, S=60, sparsity=0.3):
    d = rng.uniform(0, 4, size=(k, R, S)).astype(np.float32)
    d[rng.uniform(size=d.shape) < sparsity] = 0.0
    return d


def test_distance_matrix_matches_oracle_full(rng):
    q = random_descs(rng, 4)
    t = random_descs(rng, 5)
    dist, shift = sc.sc_distance_matrix(jnp.asarray(q), jnp.asarray(t), full_shift_search=True)
    dist, shift = np.asarray(dist), np.asarray(shift)
    for i in range(4):
        for j in range(5):
            d_ref, s_ref = np_distance_btn(q[i], t[j], full=True)
            assert abs(dist[i, j] - d_ref) < 1e-4, (i, j)
            # shift may tie; check distance at reported shift
            d_at = np_dist_direct(q[i], np_circshift(t[j], int(shift[i, j])))
            assert abs(d_at - d_ref) < 1e-4


def test_distance_matrix_matches_oracle_windowed(rng):
    q = random_descs(rng, 3)
    t = random_descs(rng, 3)
    dist, shift = sc.sc_distance_matrix(jnp.asarray(q), jnp.asarray(t), full_shift_search=False)
    dist = np.asarray(dist)
    for i in range(3):
        for j in range(3):
            d_ref, _ = np_distance_btn(q[i], t[j], full=False)
            assert abs(dist[i, j] - d_ref) < 1e-4, (i, j)


def test_yaw_shift_recovery(rng):
    """A scan rotated by k sectors must match with shift k and near-zero dist."""
    pts = rng.normal(size=(2000, 3)).astype(np.float32) * np.array([25, 25, 2])
    mask = jnp.ones(2000, bool)
    d0 = polar_bin.make_descriptor(jnp.asarray(pts), mask)

    k_shift = 7
    ang = 2 * np.pi * k_shift / 60
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    d1 = polar_bin.make_descriptor(jnp.asarray(pts @ R.T), mask)

    dist, shift = sc.sc_distance_matrix(d0[None], d1[None], full_shift_search=True)
    assert float(dist[0, 0]) < 0.05
    # rotating points by +ang shifts sectors; aligning back requires 60-k or k
    assert int(shift[0, 0]) in (k_shift, 60 - k_shift)


def test_detect_loops_between_sessions(rng):
    """Loops found exactly where target database contains near-duplicates."""
    t = random_descs(rng, 20, sparsity=0.5)
    # queries 0..4 are noisy copies of targets 3..7; rest random (no match)
    q = random_descs(rng, 10, sparsity=0.5)
    for i in range(5):
        q[i] = t[3 + i] + rng.normal(scale=0.01, size=t[0].shape).astype(np.float32)
    loop_idx, dist, yaw = sc.detect_loops_between_sessions(
        jnp.asarray(q), jnp.ones(10, bool), jnp.asarray(t), jnp.ones(20, bool),
        dist_threshold=0.2,
    )
    loop_idx = np.asarray(loop_idx)
    np.testing.assert_array_equal(loop_idx[:5], np.arange(3, 8))
    # random queries: overwhelmingly no loop (allow none to match)
    assert (loop_idx[5:] == -1).all()


def test_ring_sector_keys(rng):
    d = random_descs(rng, 2)
    np.testing.assert_allclose(np.asarray(sc.ring_keys(jnp.asarray(d))), d.mean(-1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sc.sector_keys(jnp.asarray(d))), d.mean(-2), atol=1e-6)


def test_intra_session_loop_detection(rng):
    from ltm.retrieval.scancontext import detect_loops_intra_session

    K = 50
    descs = random_descs(rng, K, sparsity=0.5)
    # node 45 revisits node 3's place
    descs[45] = descs[3] + rng.normal(scale=0.01, size=descs[0].shape).astype(np.float32)
    loop_idx, dist, yaw = detect_loops_intra_session(
        jnp.asarray(descs), jnp.ones(K, bool), dist_threshold=0.2, num_exclude_recent=30,
    )
    loop_idx = np.asarray(loop_idx)
    assert loop_idx[45] == 3
    # early nodes can never match (no database older than exclusion window)
    assert (loop_idx[:31] == -1).all()
    # matches never point at recent nodes
    for q in range(K):
        if loop_idx[q] >= 0:
            assert loop_idx[q] <= q - 30
