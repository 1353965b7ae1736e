"""Pallas TPU kernel: fused brute-force 2-NN (distance matmul + running min).

The XLA formulation (``ltm.kernels.knn.knn_sqdists``) streams target tiles
through a ``lax.scan`` whose per-tile (N, tile) distance block and top-k
merge round-trip through HBM between fusions.  This kernel keeps everything
on-chip: each grid step computes one (BQ, BT) distance block on the MXU from
VMEM-resident point tiles and folds it into a running minimum that never
leaves VMEM until the grid finishes.

Memory layout matters at map scale: point arrays are passed TRANSPOSED as
(8, N) — an (N, 8) layout gets (8, 128)-tiled by XLA with 16x lane padding
(~4 GB of pure padding for a 4M-point map, an HBM OOM in production).  The
(8, N) layout tiles with zero waste.  Validity is encoded as a sentinel
coordinate (1e12) instead of a separate mask input.

Grid: (num_query_blocks, num_target_blocks); the target dimension iterates
fastest and revisits the same output block, which is safe on TPU's
sequential grid (accumulation pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn2_sqdists_pallas"]

_BIG = 1e30
_SENTINEL = 1e12  # invalid-point coordinate: distances ~1e24 dominate everything


def _kernel(qt_ref, tt_ref, out_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.full(out_ref.shape, _BIG, jnp.float32)
        idx_ref[:, :] = jnp.zeros(idx_ref.shape, jnp.int32)

    qt = qt_ref[:, :]                    # (8, BQ) — xyz rows 0..2, zeros 3..7
    tt = tt_ref[:, :]                    # (8, BT)
    q2 = jnp.sum(qt * qt, axis=0)        # (BQ,)
    t2 = jnp.sum(tt * tt, axis=0)        # (BT,)
    # f32 matmul (HIGHEST) only SELECTS candidates; distances are recomputed
    # exactly afterwards, so selection-order accuracy is all that matters.
    cross = jax.lax.dot_general(
        qt, tt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )                                    # (BQ, BT)
    d2 = q2[:, None] + t2[None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)

    # fused value+index min: for non-negative floats the IEEE bit pattern is
    # order-preserving as int32, so pack the lane index into the low 11
    # mantissa bits (BT <= 2048) and do ONE min-reduction per rank instead of
    # separate min/argmin passes (this kernel is VPU-reduction-bound).
    bt = d2.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    bits = pltpu.bitcast(d2, jnp.int32)
    packed = (bits & jnp.int32(~0x7FF)) | cols
    p1 = jnp.min(packed, axis=1, keepdims=True)            # (BQ, 1)
    col1 = (p1 & 0x7FF)[:, 0]
    m1 = pltpu.bitcast(p1 & jnp.int32(~0x7FF), jnp.float32)[:, 0]
    packed2 = jnp.where(cols == col1[:, None], jnp.int32(0x7F000000), packed)
    p2 = jnp.min(packed2, axis=1, keepdims=True)
    m2 = pltpu.bitcast(p2 & jnp.int32(~0x7FF), jnp.float32)[:, 0]
    base = j * bt
    am1 = col1 + base
    am2 = (p2 & 0x7FF)[:, 0] + base

    a = out_ref[0, :]
    b = out_ref[1, :]
    ia = idx_ref[0, :]
    ib = idx_ref[1, :]
    # merge sorted pairs (a<=b, m1<=m2) keeping indices aligned
    take1 = m1 < a
    n1 = jnp.where(take1, m1, a)
    i1 = jnp.where(take1, am1, ia)
    mid = jnp.where(take1, a, m1)
    imid = jnp.where(take1, ia, am1)
    use_mid = mid < jnp.where(take1, m2, b)
    n2 = jnp.where(use_mid, mid, jnp.where(take1, m2, b))
    i2 = jnp.where(use_mid, imid, jnp.where(take1, am2, ib))
    out_ref[0, :] = n1
    out_ref[1, :] = n2
    idx_ref[0, :] = i1
    idx_ref[1, :] = i2


@functools.partial(jax.jit, static_argnames=("bq", "bt", "interpret"))
def knn2_sqdists_pallas(
    query_xyz: jax.Array,   # (N, 3)
    query_mask: jax.Array,  # (N,)
    target_xyz: jax.Array,  # (M, 3)
    target_mask: jax.Array, # (M,)
    bq: int = 512,
    bt: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(N, 2) squared distances to the two nearest valid targets, ascending."""
    n, m = query_xyz.shape[0], target_xyz.shape[0]
    n_pad = (-n) % bq
    m_pad = (-m) % bt

    # recenter: distances are translation-invariant; smaller |x| means less
    # cancellation in the |q|²+|t|²-2q·t candidate search
    center = jnp.mean(jnp.where(target_mask[:, None], target_xyz, 0.0), axis=0) / jnp.maximum(
        jnp.mean(target_mask.astype(jnp.float32)), 1e-9)
    query_c = query_xyz - center
    target_c = target_xyz - center

    def to_t8(x, mask, rows):
        # (N, 3) -> (8, N+pad) transposed, invalid points -> sentinel coords
        x = jnp.where(mask[:, None], x, _SENTINEL).astype(jnp.float32)
        xt = jnp.pad(x.T, ((0, 5), (0, rows)), constant_values=_SENTINEL)
        # zero the 5 extra coordinate rows (sentinel only via xyz rows)
        return xt.at[3:, :].set(0.0)

    qt = to_t8(query_c, query_mask, n_pad)
    tt = to_t8(target_c, target_mask, m_pad)

    _, idx = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, qt.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((2, qt.shape[1]), jnp.int32),
        ),
        grid=(qt.shape[1] // bq, tt.shape[1] // bt),
        in_specs=[
            pl.BlockSpec((8, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qt, tt)

    # exact refinement: the matmul trick |q|²+|t|²-2q·t loses ~|x|²·eps of
    # precision; recompute the 2 selected distances as (q-t)² (exact in f32)
    idx = idx.T[:n]                                          # (n, 2)
    idx_c = jnp.clip(idx, 0, m - 1)
    sel = target_c[idx_c.reshape(-1)].reshape(n, 2, 3)
    diff = query_c[:, None, :] - sel
    d_exact = jnp.sum(diff * diff, axis=-1)
    sel_valid = target_mask[idx_c] & (idx < m)
    d_exact = jnp.where(sel_valid, d_exact, _BIG)
    return jnp.where(query_mask[:, None], jnp.sort(d_exact, axis=1), _BIG)
