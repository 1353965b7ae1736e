"""Brute-force tiled k-nearest-neighbour kernels (MXU formulation).

The reference runs PCL kd-tree ``nearestKSearch`` per point inside OpenMP
loops (``ltremovert/src/Session.cpp:592,627``) with k=2 and compares the
*average of squared L2 distances* against a threshold (PCL returns squared
distances).  On TPU the same query is a tiled distance matmul with a running
top-k: ``|q - t|^2 = |q|^2 + |t|^2 - 2 q·t`` — the cross term is a single
MXU matmul per tile, and the running k-smallest merge stays in registers.

Exact (no approximation); fixed shapes; jit/vmap/shard_map-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["knn_sqdists", "knn_avg_sqdist", "nn_sqdist_argmin"]

_BIG = 1e30  # plain float: no backend init at import (pod workers)


def _pad_axis(a, size, axis, value=0.0):
    pad = size - a.shape[axis]
    if pad <= 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


def _bbox_mid(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """Midpoint of the masked bounding box (0 where no valid points).

    Squared distances are translation-invariant, but the |q|²+|t|²-2q·t
    candidate search carries ~|coord|²·eps of cancellation error — at
    map coordinates (km) that is ~0.5 m², enough to select the WRONG
    nearest neighbours (no after-the-fact refinement recovers them).
    Centering at the bbox midpoint minimizes the post-shift extent.
    """
    lo = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -jnp.inf), axis=0)
    return jnp.where(jnp.isfinite(lo), 0.5 * (lo + hi), 0.0)


@partial(jax.jit, static_argnames=("k", "tile", "refine"))
def knn_sqdists(
    query_xyz: jax.Array,   # (N, 3)
    query_mask: jax.Array,  # (N,)
    target_xyz: jax.Array,  # (M, 3)
    target_mask: jax.Array, # (M,)
    k: int = 2,
    tile: int = 8192,
    refine: int = 16,
) -> jax.Array:
    """Squared distances to the k nearest valid targets, (N, k) ascending.

    Selection runs on bbox-centered matmul distances with a top-max(k,refine)
    slack carried through the tile scan; the kept candidates are re-scored
    exactly as (q-t)² (error-free in f32 for nearby points, Sterbenz) and the
    k smallest exact values returned.  The slack makes mis-selection require
    ``refine`` distinct targets inside the residual-error band ahead of a
    true neighbour — vanishingly unlikely at survey-map densities.

    Invalid queries get _BIG rows; fewer than k valid targets pads with _BIG.
    """
    n = query_xyz.shape[0]
    m = target_xyz.shape[0]
    k_run = max(k, min(refine, m))
    mid = _bbox_mid(target_xyz, target_mask)
    q_c = query_xyz - mid
    t_c = target_xyz - mid
    m_pad = ((m + tile - 1) // tile) * tile
    t_xyz = _pad_axis(t_c, m_pad, 0)
    t_mask = _pad_axis(target_mask, m_pad, 0, value=False)
    t_xyz = t_xyz.reshape(m_pad // tile, tile, 3)
    t_mask = t_mask.reshape(m_pad // tile, tile)

    q2 = jnp.sum(q_c * q_c, axis=-1)  # (N,)

    def body(carry, inp):
        best_d, best_i = carry
        tile_no, txyz, tmask = inp
        t2 = jnp.sum(txyz * txyz, axis=-1)
        cross = jnp.dot(q_c, txyz.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + t2[None, :] - 2.0 * cross
        d2 = jnp.where(tmask[None, :], jnp.maximum(d2, 0.0), _BIG)
        # merge running best (N, k_run) with tile candidates (N, tile)
        merged = jnp.concatenate([best_d, d2], axis=1)
        tile_ids = jnp.broadcast_to(
            tile_no * tile + jnp.arange(tile, dtype=jnp.int32)[None, :], d2.shape
        )
        merged_i = jnp.concatenate([best_i, tile_ids], axis=1)
        neg_top, pos = jax.lax.top_k(-merged, k_run)
        new_i = jnp.take_along_axis(merged_i, pos, axis=1)
        return (-neg_top, new_i), None

    init = (jnp.full((n, k_run), _BIG, jnp.float32), jnp.zeros((n, k_run), jnp.int32))
    (best, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(m_pad // tile, dtype=jnp.int32), t_xyz, t_mask)
    )
    # exact re-score of all k_run kept candidates, then exact top-k.
    # ORIGINAL coordinates, not centered: q_c/t_c each carry up to
    # ~extent·eps of centering round-off, which perturbs d² by ~4e-5 at
    # km-scale maps — enough to flip a decision sitting exactly on a
    # threshold; (q - t) on the original coords is Sterbenz-exact for
    # nearby points and bitwise-consistent with the direct-form kernels
    # (chunk_knn, grid_knn), so every path agrees on borderline queries.
    sel = target_xyz[jnp.clip(best_i, 0, m - 1)]            # (N, k_run, 3)
    diff = query_xyz[:, None, :] - sel
    d_exact = jnp.sum(diff * diff, axis=-1)
    sel_valid = target_mask[jnp.clip(best_i, 0, m - 1)] & (best_i < m) & (best < _BIG)
    d_exact = jnp.where(sel_valid, d_exact, _BIG)
    d_exact = jnp.sort(d_exact, axis=-1)[:, :k]
    return jnp.where(query_mask[:, None], d_exact, _BIG)


def knn_avg_sqdist(query_xyz, query_mask, target_xyz, target_mask, k: int = 2, tile: int = 8192,
                   use_pallas=None):
    """Average of k nearest squared distances (the Removert kNN statistic,
    ``ltremovert/src/Session.cpp:592-594``).

    On TPU with k=2 this dispatches to the fused Pallas kernel
    (``ltm.kernels.pallas_knn``, ~5x the XLA scan)."""
    if use_pallas is None:
        # cap the Pallas path at ~2M targets: Mosaic compile time grows with
        # the target grid length (measured ~9 min at 4M) while the XLA scan
        # matches its runtime there anyway
        use_pallas = (k == 2 and jax.default_backend() in ("tpu", "axon")
                      and target_xyz.shape[0] <= (1 << 21))
        if use_pallas:
            # precision gate: the Pallas kernel exactly re-scores only its
            # top-2 matmul picks, so the centered coordinate extent must keep
            # the ~extent²·eps selection error well below the decision
            # thresholds; beyond ~256 m fall back to the slack-refined scan.
            # Under tracing (shard_map/jit) the extent is unknowable at
            # dispatch time — take the always-correct scan path.
            if isinstance(target_xyz, jax.core.Tracer):
                use_pallas = False
            else:
                mid = _bbox_mid(target_xyz, target_mask)
                ext = jnp.max(jnp.abs(jnp.where(target_mask[:, None],
                                                target_xyz - mid, 0.0)))
                use_pallas = bool(ext <= 256.0)
    if use_pallas and k == 2:
        from ltm.kernels.pallas_knn import knn2_sqdists_pallas

        d = knn2_sqdists_pallas(query_xyz, query_mask, target_xyz, target_mask, bt=2048)
        return jnp.mean(d, axis=-1)
    d = knn_sqdists(query_xyz, query_mask, target_xyz, target_mask, k=k, tile=tile)
    return jnp.mean(d, axis=-1)


@partial(jax.jit, static_argnames=("k", "tile", "query_chunk"))
def chunked_knn_avg_sqdist(
    query_xyz, query_mask, target_xyz, target_mask,
    k: int = 2, tile: int = 8192, query_chunk: int = 16384,
):
    """Map-scale kNN statistic: queries stream in chunks (bounded memory:
    one (query_chunk, tile) distance block live at a time)."""
    n = query_xyz.shape[0]
    n_pad = ((n + query_chunk - 1) // query_chunk) * query_chunk
    qx = _pad_axis(query_xyz, n_pad, 0).reshape(-1, query_chunk, 3)
    qm = _pad_axis(query_mask, n_pad, 0, value=False).reshape(-1, query_chunk)

    def one(args):
        cx, cm = args
        return knn_avg_sqdist(cx, cm, target_xyz, target_mask, k=k, tile=tile)

    out = jax.lax.map(one, (qx, qm))
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("tile",))
def nn_sqdist_argmin(
    query_xyz: jax.Array,
    query_mask: jax.Array,
    target_xyz: jax.Array,
    target_mask: jax.Array,
    tile: int = 8192,
):
    """Nearest neighbour: returns (sq_dist (N,), index (N,)) into targets.

    The ICP correspondence kernel: exact 1-NN via tiled matmuls with a
    running (dist, idx) argmin carried through the scan.
    """
    n = query_xyz.shape[0]
    m = target_xyz.shape[0]
    # bbox-centering bounds the matmul cancellation error (see _bbox_mid);
    # top-1 selection noise that remains only perturbs which correspondence
    # ICP uses — harmless to its fixed-point — and distances are re-scored
    # exactly below so the fitness statistic is unaffected
    mid = _bbox_mid(target_xyz, target_mask)
    q_c = query_xyz - mid
    t_c = target_xyz - mid
    m_pad = ((m + tile - 1) // tile) * tile
    t_xyz = _pad_axis(t_c, m_pad, 0).reshape(m_pad // tile, tile, 3)
    t_mask = _pad_axis(target_mask, m_pad, 0, value=False).reshape(m_pad // tile, tile)
    q2 = jnp.sum(q_c * q_c, axis=-1)

    def body(carry, inp):
        best_d, best_i = carry
        tile_idx, txyz, tmask = inp
        t2 = jnp.sum(txyz * txyz, axis=-1)
        cross = jnp.dot(q_c, txyz.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + t2[None, :] - 2.0 * cross
        d2 = jnp.where(tmask[None, :], jnp.maximum(d2, 0.0), _BIG)
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + tile_idx * tile
        take = tile_min < best_d
        return (jnp.where(take, tile_min, best_d), jnp.where(take, tile_arg, best_i)), None

    init = (jnp.full((n,), _BIG, jnp.float32), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(m_pad // tile, dtype=jnp.int32), t_xyz, t_mask)
    )
    # exact re-score of the selected correspondence (original coords:
    # Sterbenz-exact for nearby points, no centering round-off)
    diff = query_xyz - target_xyz[jnp.clip(best_i, 0, m - 1)]
    d_exact = jnp.sum(diff * diff, axis=-1)
    best_d = jnp.where(best_d < _BIG, d_exact, _BIG)
    best_d = jnp.where(query_mask, best_d, _BIG)
    return best_d, best_i
