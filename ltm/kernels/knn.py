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

_BIG = jnp.float32(1e30)


def _pad_axis(a, size, axis, value=0.0):
    pad = size - a.shape[axis]
    if pad <= 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_sqdists(
    query_xyz: jax.Array,   # (N, 3)
    query_mask: jax.Array,  # (N,)
    target_xyz: jax.Array,  # (M, 3)
    target_mask: jax.Array, # (M,)
    k: int = 2,
    tile: int = 8192,
) -> jax.Array:
    """Squared distances to the k nearest valid targets, (N, k) ascending.

    Invalid queries get _BIG rows; fewer than k valid targets pads with _BIG.
    """
    n = query_xyz.shape[0]
    m = target_xyz.shape[0]
    m_pad = ((m + tile - 1) // tile) * tile
    t_xyz = _pad_axis(target_xyz, m_pad, 0)
    t_mask = _pad_axis(target_mask, m_pad, 0, value=False)
    t_xyz = t_xyz.reshape(m_pad // tile, tile, 3)
    t_mask = t_mask.reshape(m_pad // tile, tile)

    q2 = jnp.sum(query_xyz * query_xyz, axis=-1)  # (N,)

    def body(best, inp):
        txyz, tmask = inp
        t2 = jnp.sum(txyz * txyz, axis=-1)
        cross = jnp.dot(query_xyz, txyz.T, preferred_element_type=jnp.float32)
        d2 = q2[:, None] + t2[None, :] - 2.0 * cross
        d2 = jnp.where(tmask[None, :], jnp.maximum(d2, 0.0), _BIG)
        # merge running best (N, k) with tile candidates (N, tile)
        merged = jnp.concatenate([best, d2], axis=1)
        neg_top, _ = jax.lax.top_k(-merged, k)
        return -neg_top, None

    init = jnp.full((n, k), _BIG, jnp.float32)
    best, _ = jax.lax.scan(body, init, (t_xyz, t_mask))
    best = jnp.sort(best, axis=-1)
    return jnp.where(query_mask[:, None], best, _BIG)


def knn_avg_sqdist(query_xyz, query_mask, target_xyz, target_mask, k: int = 2, tile: int = 8192):
    """Average of k nearest squared distances (the Removert kNN statistic,
    ``ltremovert/src/Session.cpp:592-594``)."""
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
    m_pad = ((m + tile - 1) // tile) * tile
    t_xyz = _pad_axis(target_xyz, m_pad, 0).reshape(m_pad // tile, tile, 3)
    t_mask = _pad_axis(target_mask, m_pad, 0, value=False).reshape(m_pad // tile, tile)
    q2 = jnp.sum(query_xyz * query_xyz, axis=-1)

    def body(carry, inp):
        best_d, best_i = carry
        tile_idx, txyz, tmask = inp
        t2 = jnp.sum(txyz * txyz, axis=-1)
        cross = jnp.dot(query_xyz, txyz.T, preferred_element_type=jnp.float32)
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
    best_d = jnp.where(query_mask, best_d, _BIG)
    return best_d, best_i
