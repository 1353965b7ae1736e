"""Grid-bucketed 2-NN: the algorithmic fast path for map-scale kNN.

Brute-force kNN costs O(N·M) — fine for submaps, ruinous for multi-million
point maps.  This kernel exploits that the Removert kNN statistic only feeds
*threshold decisions* (coexist/diff at ``knn_avg_sqdist_threshold``,
weak→strong at 1 m², ``ltremovert/src/Session.cpp:596,475``):

  * targets bucket into a uniform grid of ``cell_size`` cells;
  * queries bucket into the same grid; every query in a cell shares the same
    3×3×3 neighborhood of target cells, so the neighborhood is gathered ONCE
    per cell (block-granular DMA) and all its queries score against it as one
    dense distance block (MXU/VPU);
  * distances are CLAMPED at ``cell_size²``: any true neighbor outside the
    27-neighborhood is farther than ``cell_size`` away.  Per-distance
    decisions ``d < t`` are exact for ``t ≤ cell_size²``; decisions on the
    AVERAGE of k distances are exact for ``t ≤ cell_size²/k`` (if the
    clamped sum is below k·t, no addend reached the clamp).  Size the cell
    so that ``cell_size² ≥ k · max(threshold)`` — e.g. 2 m cells cover the
    Removert thresholds 0.01/0.04 m² and the 1 m² weak→strong bound at k=2.

Work: O(27 · cell_capacity · N) — independent of map size.  Fixed shapes
throughout (cell capacities + counts; overflow reported).  Coordinates must
stay within ±(2^9 · cell_size) of the origin (packed 10-bit cell indices).

Applicability (measured, TPU v5e): the fixed-capacity padding means real
work scales with capacity/occupancy.  On dense, evenly occupied grids
(occupancy near capacity) this wins big; on sparse outdoor maps
(~1-2 queries per cell vs capacity tens) the padding waste makes the
brute-force Pallas kernel faster — the pipeline therefore defaults to
brute force, and occupancy-adaptive chunking is the round-2 item
(docs/PERF.md backlog).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["GridBuckets", "build_grid_buckets", "grid_knn2_sqdists"]

_BIG = 1e30  # plain float: a module-level jnp constant would initialize the
# backend at import time, breaking jax.distributed.initialize on pod workers
_COORD_BITS = 10          # cells per axis: 2^10 (± 512); key packs 3 axes
_COORD_OFF = 1 << (_COORD_BITS - 1)


def _cell_keys(xyz: jax.Array, mask: jax.Array, cell_size: float) -> jax.Array:
    """Packed int32 cell key per point; invalid points -> INT32_MAX."""
    c = jnp.floor(xyz / cell_size).astype(jnp.int32) + _COORD_OFF
    c = jnp.clip(c, 0, (1 << _COORD_BITS) - 1)
    key = (c[:, 0] << (2 * _COORD_BITS)) | (c[:, 1] << _COORD_BITS) | c[:, 2]
    return jnp.where(mask, key, jnp.int32(2**31 - 1))


class GridBuckets(NamedTuple):
    keys: jax.Array        # (n_cells,) sorted packed cell keys (pad = INT32_MAX)
    xyz: jax.Array         # (n_cells, capacity, 3)
    mask: jax.Array        # (n_cells, capacity)
    perm: jax.Array        # (n_cells, capacity) original point index (for scatter-back)
    cell_size: float


@partial(jax.jit, static_argnames=("n_cells", "capacity"))
def build_grid_buckets(xyz: jax.Array, mask: jax.Array, cell_size: float,
                       n_cells: int, capacity: int):
    """Bucket points into grid cells.  Returns (GridBuckets, overflow_count);
    overflow > 0 means a cell exceeded ``capacity`` or cells exceeded
    ``n_cells`` and points were dropped (size up and rebuild)."""
    n = xyz.shape[0]
    key = _cell_keys(xyz, mask, cell_size)
    order = jnp.argsort(key)
    ks = key[order]
    ms = mask[order]

    new_cell = (ks != jnp.roll(ks, 1)).at[0].set(True) & ms
    idx = jnp.arange(n)
    # lax.cummax: jnp.maximum.accumulate lowers to O(n*window) reduce_window
    # on TPU (measured 2.9 s/1M in blocks.py) — the scan form is ~ms
    cell_start = jax.lax.cummax(jnp.where(new_cell, idx, 0))
    within = idx - cell_start
    cell_id = jnp.cumsum(new_cell.astype(jnp.int32)) - 1

    fits = ms & (within < capacity) & (cell_id < n_cells)
    overflow = jnp.sum((ms & ~fits).astype(jnp.int32))

    flat = jnp.where(fits, cell_id * capacity + within, n_cells * capacity)
    out_xyz = jnp.zeros((n_cells * capacity + 1, 3), xyz.dtype).at[flat].set(xyz[order], mode="drop")
    out_mask = jnp.zeros((n_cells * capacity + 1,), bool).at[flat].set(fits, mode="drop")
    out_perm = jnp.zeros((n_cells * capacity + 1,), jnp.int32).at[flat].set(order.astype(jnp.int32), mode="drop")

    # one key write per cell: only the cell's first (new_cell) element writes
    valid_start = new_cell & (cell_id < n_cells)
    cell_keys = jnp.full((n_cells + 1,), jnp.int32(2**31 - 1))
    cell_keys = cell_keys.at[jnp.where(valid_start, cell_id, n_cells)].set(
        jnp.where(valid_start, ks, 2**31 - 1), mode="drop"
    )
    gb = GridBuckets(
        keys=cell_keys[:n_cells],
        xyz=out_xyz[:-1].reshape(n_cells, capacity, 3),
        mask=out_mask[:-1].reshape(n_cells, capacity),
        perm=out_perm[:-1].reshape(n_cells, capacity),
        cell_size=cell_size,
    )
    return gb, overflow


def _unpack(key):
    x = key >> (2 * _COORD_BITS)
    y = (key >> _COORD_BITS) & ((1 << _COORD_BITS) - 1)
    z = key & ((1 << _COORD_BITS) - 1)
    return x, y, z


@partial(jax.jit, static_argnames=("k", "num_queries"))
def grid_knn2_sqdists(query_grid: GridBuckets, target_grid: GridBuckets,
                      num_queries: int, k: int = 2) -> jax.Array:
    """(num_queries, k) squared distances (ascending), CLAMPED at cell_size².

    Both grids must share ``cell_size``.  Exact for every threshold decision
    at or below cell_size² (see module docstring).
    """
    cs2 = jnp.float32(query_grid.cell_size * query_grid.cell_size)
    qx, qy, qz = _unpack(query_grid.keys)

    # 27 neighbor cell keys per query cell -> index into the sorted target keys
    offs = jnp.arange(-1, 2)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    d_off = (ox.ravel() << (2 * _COORD_BITS)) + (oy.ravel() << _COORD_BITS) + oz.ravel()  # (27,)
    neigh_keys = query_grid.keys[:, None] + d_off[None, :]           # (Qc, 27)
    pos = jnp.searchsorted(target_grid.keys, neigh_keys)             # (Qc, 27)
    pos_c = jnp.minimum(pos, target_grid.keys.shape[0] - 1)
    hit = target_grid.keys[pos_c] == neigh_keys                      # (Qc, 27)
    tcell = jnp.where(hit, pos_c, target_grid.keys.shape[0] - 1)

    C = target_grid.xyz.shape[1]
    Qc = query_grid.xyz.shape[1]

    def per_cell(q_xyz, q_mask, tcells, thits):
        # gather the 27-neighborhood once for all queries of this cell
        t_xyz = target_grid.xyz[tcells].reshape(27 * C, 3)
        t_mask = (target_grid.mask[tcells] & thits[:, None]).reshape(27 * C)
        d2 = (
            jnp.sum(q_xyz * q_xyz, axis=1)[:, None]
            + jnp.sum(t_xyz * t_xyz, axis=1)[None, :]
            - 2.0 * jnp.dot(q_xyz, t_xyz.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        )
        d2 = jnp.where(t_mask[None, :], jnp.maximum(d2, 0.0), _BIG)
        neg_top, idx = jax.lax.top_k(-d2, k)
        best = -neg_top
        # exact refinement of the selected candidates
        sel = t_xyz[idx.reshape(-1)].reshape(Qc, k, 3)
        diff = q_xyz[:, None, :] - sel
        exact = jnp.sum(diff * diff, axis=-1)
        exact = jnp.where(best < _BIG, exact, _BIG)
        exact = jnp.sort(exact, axis=-1)
        # clamp: beyond the neighborhood guarantee everything is "far"
        exact = jnp.minimum(exact, cs2)
        return jnp.where(q_mask[:, None], exact, _BIG)

    # batch_size vmaps chunks of cells per step (plain lax.map would run the
    # cell loop sequentially — hundreds of thousands of tiny dispatches)
    d = jax.lax.map(
        lambda args: per_cell(*args),
        (query_grid.xyz, query_grid.mask, tcell, hit),
        batch_size=min(256, query_grid.xyz.shape[0]),
    )                                                                # (Qc_cells, Qc, k)

    # scatter back to original query order
    out = jnp.full((num_queries + 1, k), _BIG, jnp.float32)
    flat_perm = jnp.where(query_grid.mask.reshape(-1), query_grid.perm.reshape(-1), num_queries)
    out = out.at[flat_perm].set(d.reshape(-1, k), mode="drop")
    return out[:num_queries]
