"""Occupancy-adaptive chunked 2-NN over block-structured maps.

The round-1 grid kNN (``ltm.kernels.grid_knn``) pays a fixed per-cell
capacity regardless of occupancy; on sparse outdoor maps (~1-2 points per
2 m cell) that is ~97% padded waste and it loses to brute force.  This
kernel removes the waste by amortizing the neighborhood over a *chunk* of
spatially sorted queries instead of a single cell:

  * queries are sorted by coarse voxel (one ``lexsort``) and split into
    fixed chunks; each chunk's bounding ball is computed on the fly, so the
    working set adapts to the *actual* occupancy instead of a fixed
    per-cell capacity;
  * the target map is the existing block layout (``ltm.kernels.blocks``,
    the same one the visibility sweeps use — already the canonical map
    layout of blocked sessions, so named masks restrict targets for free);
  * per chunk, only blocks intersecting ``ball(center, radius + r)`` are
    gathered (block-granular DMA) and scored as one dense distance block
    (MXU), with a running top-k and exact refinement as in
    ``ltm.kernels.knn``.

Distances are CLAMPED at ``r² = clamp_radius²`` — the same contract as the
grid kernel: a true neighbor outside the gathered ball is provably farther
than ``clamp_radius`` (for a target p in an excluded block B,
``|p - center| ≥ dist(center, B) > radius + r`` so ``|p - q| > r`` for
every chunk query q).  Per-distance threshold decisions are exact for
thresholds ≤ r²; decisions on the AVERAGE of k distances are exact for
thresholds ≤ r²/k (if the clamped sum is below k·t no addend reached the
clamp).  The Removert statistic (``ltremovert/src/Session.cpp:592-596``,
avg of k=2 squared NN distances vs 0.01 m²; weak→strong promotion at 1 m²,
``:475``) therefore needs ``clamp_radius ≥ sqrt(k · max_threshold)``.

Chunks whose intersecting-block count exceeds ``k_blocks`` are reported
per-chunk in ``ChunkKnnResult.chunk_overflow`` (top-k keeps the *nearest*
blocks, so a dropped block could hide a true neighbor): callers must
re-resolve those chunks' queries exactly — the pipeline brute-forces them
(``Removerter._chunk_knn_stat``), so k_blocks is a *tuning* constant, not
a correctness one.  ``ChunkKnnResult.order`` maps sorted positions back to
original query indices for exactly that purpose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from typing import NamedTuple

from ltm.kernels.blocks import BlockMap

__all__ = ["ChunkKnnResult", "chunk_knn_sqdists", "chunk_knn_avg_sqdist"]


class ChunkKnnResult(NamedTuple):
    sqdists: jax.Array         # (N, k) clamped ascending; _BIG for invalid queries
    chunk_overflow: jax.Array  # (C,) int32 — excess intersecting blocks per chunk
    order: jax.Array           # (N,) original query index at each sorted position
                               # (chunk c covers sorted positions [c·chunk, (c+1)·chunk))

_BIG = 1e30  # plain float: a module-level jnp constant would initialize the
# backend at import time, breaking jax.distributed.initialize on pod workers


def _spread3(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of int32 v so consecutive bits land 3 apart
    (Morton-code component; 10 bits/axis = ±512 sort cells)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _block_bounds(bm: BlockMap, target_extra):
    """(t_mask, bval, blo, bhi): valid-subset mask + tight per-block AABBs.

    The ball-ball test |center-block_center| - block_radius inflates every
    selection by the block radius (~cell_size·√3/2); the point-to-AABB
    distance doesn't, which cuts selected blocks ~3-4x on spill-heavy dense
    maps."""
    t_mask = bm.mask
    if target_extra is not None:
        t_mask = t_mask & target_extra.reshape(bm.num_blocks, bm.block_capacity)
    bval = jnp.any(t_mask, axis=1)
    mfill = t_mask[..., None]
    blo = jnp.min(jnp.where(mfill, bm.xyz, jnp.inf), axis=1)    # (n_blocks, 3)
    bhi = jnp.max(jnp.where(mfill, bm.xyz, -jnp.inf), axis=1)
    return t_mask, bval, blo, bhi


def _prep_sorted_chunks(query_xyz, query_mask, chunk: int, sort_cell: float):
    """Morton-sort queries and split into fixed chunks.

    Returns (qx (C,chunk,3), qm (C,chunk), order (N,)).  Z-curve order:
    raster/lexicographic order produces wrap-around chunks at every row
    transition (a chunk spanning y=max → y=min has a bounding ball covering
    the whole cross-section, forcing k_blocks toward n_blocks); Morton keeps
    contiguous index ranges spatially compact, so chunk balls stay
    ~chunk-sized.  Cells are offset by the data minimum, NOT a fixed
    constant: a fixed offset parks the densest region on a high-bit Morton
    seam (cells 511↔512 differ in every bit), which measured 3-5x wider
    chunk balls."""
    n = query_xyz.shape[0]
    coords = jnp.floor(query_xyz / sort_cell).astype(jnp.int32)
    cmin = jnp.min(jnp.where(query_mask[:, None], coords, jnp.int32(2**30)), axis=0)
    coords = jnp.clip(coords - cmin, 0, 1023)
    key = (_spread3(coords[:, 0]) | (_spread3(coords[:, 1]) << 1)
           | (_spread3(coords[:, 2]) << 2))
    key = jnp.where(query_mask, key, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    qx = jnp.pad(query_xyz[order], ((0, pad), (0, 0)))
    qm = jnp.pad(query_mask[order], ((0, pad),), constant_values=False)
    return qx.reshape(-1, chunk, 3), qm.reshape(-1, chunk), order


@partial(jax.jit, static_argnames=("clamp_radius", "k", "k_blocks"))
def _scan_chunks(qx, qm, bm_xyz, t_mask, bval, blo, bhi,
                 clamp_radius: float, k: int, k_blocks: int):
    """The per-chunk gather+score scan over a leading chunk axis — the
    sharding unit of the distributed kNN path (chunks are embarrassingly
    parallel).  Returns (chunk_overflow (C,), d (C, chunk, k))."""
    chunk = qx.shape[1]
    r2 = jnp.float32(clamp_radius * clamp_radius)

    def body(_, inp):
        qc, qmc = inp                                     # (chunk,3), (chunk,)
        cnt = jnp.sum(qmc)
        # invalid (padding) queries Morton-sort to the end, so padded maps
        # produce a TAIL of all-invalid chunks; lax.cond (not vmapped here,
        # a real branch) skips their gather/score work entirely — without
        # this, a map padded to capacity pays full per-chunk cost on padding
        # (measured: the bulk of smoke-scale pipeline wall time)
        ov_out = jax.lax.cond(cnt > 0, _active, _empty, qc, qmc, cnt)
        return None, ov_out

    def _empty(qc, qmc, cnt):
        return jnp.int32(0), jnp.full((chunk, k), _BIG, jnp.float32)

    def _active(qc, qmc, cnt):
        center = jnp.sum(jnp.where(qmc[:, None], qc, 0.0), axis=0) / jnp.maximum(cnt, 1)
        rad = jnp.max(jnp.where(qmc, jnp.linalg.norm(qc - center, axis=-1), 0.0))

        gap = jnp.maximum(jnp.maximum(blo - center, center - bhi), 0.0)
        dblk = jnp.linalg.norm(gap, axis=-1)
        intersect = bval & (dblk <= rad + clamp_radius) & (cnt > 0)
        n_int = jnp.sum(intersect.astype(jnp.int32))
        score = jnp.where(intersect, dblk, jnp.inf)
        neg, sel = jax.lax.top_k(-score, k_blocks)
        sel_ok = jnp.isfinite(neg)

        cand = bm_xyz[sel].reshape(-1, 3)                 # block-granular gather
        cmask = (t_mask[sel] & sel_ok[:, None]).reshape(-1)
        # direct-form squared distances, NOT the |q|²+|t|²-2q·t matmul form:
        # at |coord| ~ 2 km the matmul form carries ~|x|²·eps ≈ 0.5 m² of
        # cancellation error — top-k then selects the WRONG candidates and
        # no after-the-fact refinement can recover them (measured: 6% wrong
        # decisions at the 0.04 m² threshold).  (q-t) is exact in f32 for
        # nearby points (Sterbenz), so this form is exact where it matters.
        diff = qc[:, None, :] - cand[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(cmask[None, :], d2, _BIG)
        # k-fold argmin extraction, NOT lax.top_k: top_k over the wide
        # (chunk, k_blocks·cap) candidate axis sorts far more than the k=2
        # winners we need (measured 1.4x whole-kernel win); argmin one-hot
        # masking keeps exact tie semantics (removes one instance per round)
        outs = []
        for _i in range(k):
            mn = jnp.min(d2, axis=1)
            outs.append(mn)
            if _i + 1 < k:
                am = jnp.argmin(d2, axis=1)
                d2 = jnp.where(
                    jnp.arange(d2.shape[1])[None, :] == am[:, None], _BIG, d2
                )
        exact = jnp.stack(outs, axis=1)                   # (chunk, k) ascending
        exact = jnp.minimum(exact, r2)                    # clamp contract
        out = jnp.where(qmc[:, None], exact, _BIG)
        return jnp.maximum(n_int - k_blocks, 0).astype(jnp.int32), out

    _, (chunk_overflow, d) = jax.lax.scan(body, None, (qx, qm))
    return chunk_overflow, d


@partial(jax.jit, static_argnames=("clamp_radius", "k", "chunk", "k_blocks",
                                   "sort_cell"))
def chunk_knn_sqdists(
    query_xyz: jax.Array,        # (N, 3)
    query_mask: jax.Array,       # (N,)
    bm: BlockMap,                # target block layout
    target_extra: jax.Array | None,  # (n_blocks*cap,) subset mask or None
    clamp_radius: float,
    k: int = 2,
    chunk: int = 512,
    k_blocks: int = 64,
    sort_cell: float = 25.0,
):
    """ChunkKnnResult: (N, k) clamped ascending squared distances, plus the
    per-chunk machinery callers need for the overflow fallback.

    Invalid queries get _BIG rows.  See module docstring for the exactness
    contract and overflow semantics.
    """
    n = query_xyz.shape[0]
    t_mask, bval, blo, bhi = _block_bounds(bm, target_extra)
    qx, qm, order = _prep_sorted_chunks(query_xyz, query_mask, chunk, sort_cell)
    chunk_overflow, d = _scan_chunks(qx, qm, bm.xyz, t_mask, bval, blo, bhi,
                                     clamp_radius, k, k_blocks)
    res = jnp.full((n, k), _BIG, jnp.float32).at[order].set(d.reshape(-1, k)[:n])
    return ChunkKnnResult(res, chunk_overflow, order.astype(jnp.int32))


def chunk_knn_avg_sqdist(query_xyz, query_mask, bm, target_extra, clamp_radius,
                         k: int = 2, chunk: int = 512, k_blocks: int = 64,
                         sort_cell: float = 25.0):
    """(average of k clamped NN sqdists (N,), total_overflow) — the Removert
    kNN statistic over a blocked target map.  Callers wanting the per-chunk
    overflow fallback should use ``chunk_knn_sqdists`` directly."""
    r = chunk_knn_sqdists(query_xyz, query_mask, bm, target_extra,
                          clamp_radius, k=k, chunk=chunk,
                          k_blocks=k_blocks, sort_cell=sort_cell)
    return jnp.mean(r.sqdists, axis=-1), jnp.sum(r.chunk_overflow)
