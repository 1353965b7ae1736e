"""Pallas 2-NN kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from ltm.kernels import knn
from ltm.kernels.pallas_knn import knn2_sqdists_pallas


def test_pallas_knn_matches_xla(rng):
    q = rng.normal(size=(700, 3)).astype(np.float32) * 5
    t = rng.normal(size=(1500, 3)).astype(np.float32) * 5
    qm = np.ones(700, bool)
    qm[13] = False
    tm = rng.uniform(size=1500) > 0.2
    ref = np.asarray(knn.knn_sqdists(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(t), jnp.asarray(tm), k=2, tile=256))
    got = np.asarray(knn2_sqdists_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(t), jnp.asarray(tm),
                                         bq=256, bt=512, interpret=True))
    valid = qm
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-4, atol=1e-5)


def test_pallas_knn_duplicate_targets(rng):
    # duplicated target points: both copies must count as the 2-NN
    t = np.array([[1.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]], np.float32)
    t = np.tile(t, (200, 1))[:512]
    q = np.zeros((8, 3), np.float32)
    got = np.asarray(knn2_sqdists_pallas(jnp.asarray(q), jnp.ones(8, bool),
                                         jnp.asarray(t), jnp.ones(len(t), bool),
                                         bq=8, bt=512, interpret=True))
    np.testing.assert_allclose(got, np.full((8, 2), 1.0), atol=1e-6)
