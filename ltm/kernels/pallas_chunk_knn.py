"""Pallas TPU kernel: fused block-gather + 2-NN score for chunked kNN.

The XLA chunk kernel (``ltm.kernels.chunk_knn._scan_chunks``) gathers each
chunk's selected blocks into an HBM-materialized (k_blocks·cap, 3) candidate
array, then scores it — the gather round-trips HBM and was measured as the
dominant cost of the pipeline's kNN stage.  This kernel fuses the two: the
per-chunk block *selection* stays in XLA (cheap dense ball tests), and the
selected block ids are scalar-prefetched into a Pallas kernel that DMAs each
block HBM→VMEM (double-buffered) and folds its distances into a running
top-2 that never leaves VMEM.

Exactness contract is identical to ``chunk_knn_sqdists`` (clamp at r²,
per-chunk overflow reporting for the driver's escalation/brute fallback):
distances use the direct (q−t)² form — see chunk_knn.py on why the matmul
form is catastrophically cancellation-prone at km coordinates — and ties
remove exactly one instance per rank (packed mantissa-index min, as in
``pallas_knn``).

Layouts: queries ride as (C, chunk, 8) blocks (xyz cols 0..2), targets as
(B+1, 8, cap) transposed blocks — one (8, cap) VMEM tile per DMA with zero
lane padding; block B is an all-sentinel block that invalid selections point
at, so the kernel needs no selection-validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ltm.kernels.blocks import BlockMap
from ltm.kernels.chunk_knn import (
    ChunkKnnResult,
    _BIG,
    _block_bounds,
    _prep_sorted_chunks,
)

__all__ = ["pallas_chunk_knn_sqdists"]

_SENTINEL = 1e12   # invalid-point coordinate: d² ~ 1e24 dominates everything


def _make_kernel(k_blocks: int, cap: int):
    big = 1.0e30  # plain float: kernels must not capture traced constants
    def kernel(sel_ref, qx_ref, tgt_hbm, out_ref):
        # sel rides as a per-chunk (1, k_blocks) SMEM block — prefetching the
        # whole (C, k_blocks) matrix overflows the 1 MB SMEM at production
        # chunk counts (measured: 1.5 MB at C=1024, k_blocks=384)
        out_ref[0] = jnp.full(out_ref.shape[1:], big, jnp.float32)

        @pl.when(sel_ref[0, 0, 0] >= 0)
        def _():
            def body(scratch, sems):
                qx = qx_ref[0]                       # (chunk, 8)

                def get_dma(slot, j):
                    # encoded entry e: block b rides at tgt index b+1 = e;
                    # invalid selections (e=0) hit the all-sentinel block
                    blk = jnp.maximum(sel_ref[0, 0, j], 0)
                    return pltpu.make_async_copy(
                        tgt_hbm.at[blk], scratch.at[slot], sems.at[slot]
                    )

                get_dma(0, 0).start()

                def loop(j, carry):
                    b1, b2 = carry                   # (chunk, 1) each
                    slot = j % 2

                    @pl.when(j + 1 < k_blocks)
                    def _():
                        get_dma((j + 1) % 2, j + 1).start()

                    get_dma(slot, j).wait()
                    tb = scratch[slot]               # (8, cap)
                    d2 = jnp.zeros((qx.shape[0], cap), jnp.float32)
                    for c in range(3):
                        diff = qx[:, c: c + 1] - tb[c: c + 1, :]
                        d2 = d2 + diff * diff
                    # exact one-instance-per-rank top-2 within the block
                    # (min + argmin one-hot mask — the packed mantissa-index
                    # trick of pallas_knn quantizes the VALUES by ~1e-4 rel,
                    # fine for candidate selection but not for distances
                    # returned directly; the XLA kernel uses this exact form)
                    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                    m1 = jnp.min(d2, axis=1, keepdims=True)          # (chunk,1)
                    am1 = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
                    d2b = jnp.where(cols == am1, big, d2)
                    m2 = jnp.min(d2b, axis=1, keepdims=True)

                    # merge sorted pairs (b1<=b2, m1<=m2)
                    take1 = m1 < b1
                    n1 = jnp.where(take1, m1, b1)
                    mid = jnp.where(take1, b1, m1)
                    n2 = jnp.minimum(mid, jnp.where(take1, m2, b2))
                    return n1, n2

                init = (jnp.full((qx.shape[0], 1), big, jnp.float32),
                        jnp.full((qx.shape[0], 1), big, jnp.float32))
                b1, b2 = jax.lax.fori_loop(0, k_blocks, loop, init)
                out_ref[0] = jnp.concatenate([b1, b2], axis=1)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((2, 8, cap), jnp.float32),
                sems=pltpu.SemaphoreType.DMA((2,)),
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("clamp_radius", "k", "chunk",
                                             "k_blocks", "sort_cell",
                                             "interpret"))
def pallas_chunk_knn_sqdists(
    query_xyz: jax.Array,        # (N, 3)
    query_mask: jax.Array,       # (N,)
    bm: BlockMap,                # target block layout
    target_extra: jax.Array | None,
    clamp_radius: float,
    k: int = 2,
    chunk: int = 256,
    k_blocks: int = 384,
    sort_cell: float = 4.0,
    interpret: bool = False,
) -> ChunkKnnResult:
    """Drop-in for :func:`ltm.kernels.chunk_knn.chunk_knn_sqdists` (k=2)."""
    assert k == 2, "the fused kernel hard-codes the pipeline's k=2"
    n = query_xyz.shape[0]
    cap = bm.block_capacity
    n_blocks = bm.num_blocks
    r2 = jnp.float32(clamp_radius * clamp_radius)

    t_mask, bval, blo, bhi = _block_bounds(bm, target_extra)
    qx, qm, order = _prep_sorted_chunks(query_xyz, query_mask, chunk, sort_cell)
    C = qx.shape[0]

    # ---- XLA pre-pass: per-chunk ball test + block selection --------------
    cnt = jnp.sum(qm, axis=1)                                   # (C,)
    center = jnp.sum(jnp.where(qm[..., None], qx, 0.0), axis=1) / jnp.maximum(cnt, 1)[:, None]
    rad = jnp.max(jnp.where(qm, jnp.linalg.norm(qx - center[:, None, :], axis=-1), 0.0), axis=1)
    gap = jnp.maximum(jnp.maximum(blo[None] - center[:, None, :], center[:, None, :] - bhi[None]), 0.0)
    dblk = jnp.linalg.norm(gap, axis=-1)                        # (C, n_blocks)
    intersect = bval[None] & (dblk <= (rad + clamp_radius)[:, None]) & (cnt > 0)[:, None]
    n_int = jnp.sum(intersect, axis=1).astype(jnp.int32)
    chunk_overflow = jnp.maximum(n_int - k_blocks, 0)
    kb = min(k_blocks, n_blocks)
    score = jnp.where(intersect, dblk, jnp.inf)
    neg, sel = jax.lax.top_k(-score, kb)                        # (C, kb)
    # encoding: selected block b -> b+1 (its index in the sentinel-prefixed
    # target array); invalid selection -> 0 (the all-sentinel block);
    # entry[0] = -1 marks an all-invalid (padding) chunk so the kernel skips
    # its DMA loop entirely
    sel_enc = jnp.where(jnp.isfinite(neg), sel + 1, 0).astype(jnp.int32)
    empty = cnt == 0
    sel_enc = sel_enc.at[:, 0].set(jnp.where(empty, -1, sel_enc[:, 0]))
    if kb < k_blocks:
        sel_enc = jnp.pad(sel_enc, ((0, 0), (0, k_blocks - kb)))

    # ---- target blocks, transposed + sentinel block 0 ---------------------
    txyz = jnp.where(t_mask[..., None], bm.xyz, _SENTINEL).astype(jnp.float32)
    tgt = jnp.zeros((n_blocks + 1, 8, cap), jnp.float32).at[0].set(_SENTINEL)
    tgt = tgt.at[1:, :3, :].set(jnp.swapaxes(txyz, 1, 2))
    tgt = tgt.at[0, 3:, :].set(0.0)

    # queries as (C, chunk, 8); invalid -> sentinel (their outputs are
    # overwritten to _BIG after the kernel anyway)
    qx8 = jnp.zeros((C, qx.shape[1], 8), jnp.float32)
    qx8 = qx8.at[:, :, :3].set(jnp.where(qm[..., None], qx, _SENTINEL))

    grid_spec = pl.GridSpec(
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, k_blocks), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qx.shape[1], 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # target blocks: HBM
        ],
        out_specs=pl.BlockSpec((1, qx.shape[1], 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_kernel(k_blocks, cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, qx.shape[1], 2), jnp.float32),
        interpret=interpret,
    )(sel_enc[:, None, :], qx8, tgt)

    d = jnp.minimum(out.reshape(-1, 2)[:n], r2)
    d = jnp.where(qm.reshape(-1)[:n, None], d, _BIG)
    res = jnp.full((n, 2), _BIG, jnp.float32).at[order].set(d)
    return ChunkKnnResult(res, chunk_overflow, order.astype(jnp.int32))
