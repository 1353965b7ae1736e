"""Fused Pallas chunk kNN vs the XLA chunk kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ltm.kernels.blocks import build_block_map
from ltm.kernels.chunk_knn import chunk_knn_sqdists
from ltm.kernels.pallas_chunk_knn import pallas_chunk_knn_sqdists


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    # corridor-ish target map + query set with some invalid entries
    t = np.concatenate([
        rng.uniform([0, -30, -3], [400, 30, 3], (20000, 3)),
        rng.uniform([0, -30, -3], [60, 30, 3], (4000, 3)),
    ]).astype(np.float32)
    t_mask = np.ones(len(t), bool)
    t_mask[::17] = False
    bm, overflow = build_block_map(jnp.asarray(t), jnp.asarray(t_mask),
                                   12.5, n_blocks=1024, block_capacity=128)
    assert int(overflow) == 0
    q = rng.uniform([0, -30, -3], [400, 30, 3], (5000, 3)).astype(np.float32)
    qm = np.ones(len(q), bool)
    qm[::13] = False
    extra = bm.flat_mask() & (jnp.arange(bm.num_blocks * bm.block_capacity) % 5 != 0)
    return jnp.asarray(q), jnp.asarray(qm), bm, extra


def test_pallas_chunk_matches_xla(setup):
    q, qm, bm, extra = setup
    clamp = 1.5
    ref = chunk_knn_sqdists(q, qm, bm, extra, clamp, k=2, chunk=256,
                            k_blocks=256, sort_cell=8.0)
    got = pallas_chunk_knn_sqdists(q, qm, bm, extra, clamp, k=2, chunk=256,
                                   k_blocks=256, sort_cell=8.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.order), np.asarray(ref.order))
    np.testing.assert_array_equal(np.asarray(got.chunk_overflow),
                                  np.asarray(ref.chunk_overflow))
    a, b = np.asarray(ref.sqdists), np.asarray(got.sqdists)
    valid = np.asarray(qm)
    np.testing.assert_allclose(b[valid], a[valid], rtol=1e-5, atol=1e-6)


def test_pallas_chunk_no_extra_mask(setup):
    q, qm, bm, _ = setup
    clamp = 1.0
    ref = chunk_knn_sqdists(q, qm, bm, None, clamp, k=2, chunk=256,
                            k_blocks=192, sort_cell=8.0)
    got = pallas_chunk_knn_sqdists(q, qm, bm, None, clamp, k=2, chunk=256,
                                   k_blocks=192, sort_cell=8.0, interpret=True)
    valid = np.asarray(qm)
    np.testing.assert_allclose(np.asarray(got.sqdists)[valid],
                               np.asarray(ref.sqdists)[valid],
                               rtol=1e-5, atol=1e-6)
