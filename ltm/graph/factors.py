"""Pose-graph factor batches (fixed shapes) and residual evaluation.

Factor types mirror the reference graph exactly
(``ltslam/src/LTslam.cpp:565-622`` + the anchored between factor
``ltslam/include/ltslam/BetweenFactorWithAnchoring.h:86-100``):

  * prior:    r = Local(measured, x_i)
  * between:  r = Local(measured, Between(x_i, x_j))
  * anchored: r = Local(measured, Between(a_i ∘ x_i, a_j ∘ x_j))

All residuals are whitened by per-factor ``inv_sigma`` 6-vectors (tangent
order [w, v] — matching the reference variance vectors at
``LTslam.cpp:100-133``).  The reference's 1e-12-variance priors (base anchor
and first node of every session) are represented as **gauge-fixed
variables** instead (``fixed`` mask) — numerically far better conditioned in
float32 and equivalent in effect.  Robust (Cauchy k=1) factors get IRLS
weights recomputed per outer iteration.

Every batch is padded to a static capacity with a validity mask, so the
whole graph evaluates as a handful of vmapped kernels under one jit.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltm.core import se3

__all__ = ["GraphData", "build_graph_data", "whitened_residuals", "robust_weights", "total_cost"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphData:
    """Padded pose-graph problem."""

    poses0: jax.Array        # (V, 4, 4) initial values
    fixed: jax.Array         # (V,) gauge-fixed variables (delta pinned to 0)

    prior_idx: jax.Array     # (P,)
    prior_meas: jax.Array    # (P, 4, 4)
    prior_inv_sigma: jax.Array  # (P, 6)
    prior_valid: jax.Array   # (P,)

    bet_i: jax.Array         # (B,)
    bet_j: jax.Array
    bet_meas: jax.Array      # (B, 4, 4)
    bet_inv_sigma: jax.Array
    bet_robust: jax.Array    # (B,) bool — Cauchy robust loss
    bet_valid: jax.Array

    anc_i: jax.Array         # (A,) node in session 1
    anc_j: jax.Array         # (A,) node in session 2
    anc_ai: jax.Array        # (A,) anchor of session 1
    anc_aj: jax.Array        # (A,) anchor of session 2
    anc_meas: jax.Array      # (A, 4, 4)
    anc_inv_sigma: jax.Array
    anc_valid: jax.Array

    @property
    def num_vars(self) -> int:
        return self.poses0.shape[0]


def build_graph_data(
    poses0: np.ndarray,
    fixed: np.ndarray,
    priors=(),          # iterable of (idx, T(4,4), sigmas(6,))
    betweens=(),        # iterable of (i, j, T, sigmas, robust: bool)
    anchored=(),        # iterable of (i, j, ai, aj, T, sigmas)
    prior_capacity: Optional[int] = None,
    between_capacity: Optional[int] = None,
    anchored_capacity: Optional[int] = None,
    dtype=np.float32,
) -> GraphData:
    """Host-side assembly into padded device arrays."""

    def pad_list(items, cap, builder):
        n = len(items)
        cap = cap if cap is not None else max(n, 1)
        if n > cap:
            raise ValueError(f"{n} factors exceed capacity {cap}")
        return builder(items, cap, n)

    def build_priors(items, cap, n):
        idx = np.zeros(cap, np.int32)
        meas = np.tile(np.eye(4, dtype=dtype), (cap, 1, 1))
        inv_sig = np.ones((cap, 6), dtype)
        valid = np.zeros(cap, bool)
        for k, (i, T, sig) in enumerate(items):
            idx[k] = i
            meas[k] = T
            inv_sig[k] = 1.0 / np.sqrt(np.asarray(sig, np.float64))
            valid[k] = True
        return idx, meas, inv_sig, valid

    def build_betweens(items, cap, n):
        ii = np.zeros(cap, np.int32)
        jj = np.zeros(cap, np.int32)
        meas = np.tile(np.eye(4, dtype=dtype), (cap, 1, 1))
        inv_sig = np.ones((cap, 6), dtype)
        rob = np.zeros(cap, bool)
        valid = np.zeros(cap, bool)
        for k, (i, j, T, sig, robust) in enumerate(items):
            ii[k], jj[k] = i, j
            meas[k] = T
            inv_sig[k] = 1.0 / np.sqrt(np.asarray(sig, np.float64))
            rob[k] = robust
            valid[k] = True
        return ii, jj, meas, inv_sig, rob, valid

    def build_anchored(items, cap, n):
        ii = np.zeros(cap, np.int32)
        jj = np.zeros(cap, np.int32)
        ai = np.zeros(cap, np.int32)
        aj = np.zeros(cap, np.int32)
        meas = np.tile(np.eye(4, dtype=dtype), (cap, 1, 1))
        inv_sig = np.ones((cap, 6), dtype)
        valid = np.zeros(cap, bool)
        for k, (i, j, a1, a2, T, sig) in enumerate(items):
            ii[k], jj[k], ai[k], aj[k] = i, j, a1, a2
            meas[k] = T
            inv_sig[k] = 1.0 / np.sqrt(np.asarray(sig, np.float64))
            valid[k] = True
        return ii, jj, ai, aj, meas, inv_sig, valid

    p = pad_list(list(priors), prior_capacity, build_priors)
    b = pad_list(list(betweens), between_capacity, build_betweens)
    a = pad_list(list(anchored), anchored_capacity, build_anchored)

    jnpa = lambda x: jnp.asarray(x)
    return GraphData(
        poses0=jnpa(np.asarray(poses0, dtype)),
        fixed=jnpa(np.asarray(fixed, bool)),
        prior_idx=jnpa(p[0]), prior_meas=jnpa(p[1]), prior_inv_sigma=jnpa(p[2]), prior_valid=jnpa(p[3]),
        bet_i=jnpa(b[0]), bet_j=jnpa(b[1]), bet_meas=jnpa(b[2]), bet_inv_sigma=jnpa(b[3]),
        bet_robust=jnpa(b[4]), bet_valid=jnpa(b[5]),
        anc_i=jnpa(a[0]), anc_j=jnpa(a[1]), anc_ai=jnpa(a[2]), anc_aj=jnpa(a[3]),
        anc_meas=jnpa(a[4]), anc_inv_sigma=jnpa(a[5]), anc_valid=jnpa(a[6]),
    )


def whitened_residuals(poses: jax.Array, g: GraphData):
    """Whitened (but not robust-weighted) residual blocks.

    Returns (prior (P,6), between (B,6), anchored (A,6)); invalid factors
    are zeroed.
    """
    xp = poses[g.prior_idx]
    rp = se3.local(g.prior_meas, xp) * g.prior_inv_sigma
    rp = jnp.where(g.prior_valid[:, None], rp, 0.0)

    xi = poses[g.bet_i]
    xj = poses[g.bet_j]
    rb = se3.local(g.bet_meas, se3.between(xi, xj)) * g.bet_inv_sigma
    rb = jnp.where(g.bet_valid[:, None], rb, 0.0)

    hi = se3.compose(poses[g.anc_ai], poses[g.anc_i])
    hj = se3.compose(poses[g.anc_aj], poses[g.anc_j])
    ra = se3.local(g.anc_meas, se3.between(hi, hj)) * g.anc_inv_sigma
    ra = jnp.where(g.anc_valid[:, None], ra, 0.0)
    return rp, rb, ra


def robust_weights(rp, rb, ra, g: GraphData, cauchy_k: float = 1.0):
    """IRLS sqrt-weights: w = 1/sqrt(1 + ||r||^2/k^2) for robust factors.

    Matches gtsam mEstimator::Cauchy (reference ``LTslam.cpp:126-133``):
    the loss ρ(e) = 0.5 k² log(1 + e²/k²) has IRLS weight ρ'(e)/e =
    1/(1 + e²/k²); whitened residuals get its square root.
    """
    k2 = cauchy_k * cauchy_k

    def w_of(r, active):
        e2 = jnp.sum(r * r, axis=-1)
        w = 1.0 / jnp.sqrt(1.0 + e2 / k2)
        return jnp.where(active, w, 1.0)

    wb = w_of(rb, g.bet_robust & g.bet_valid)
    wa = w_of(ra, g.anc_valid)  # all inter-session loops are robust in the reference
    wp = jnp.ones(rp.shape[0], rp.dtype)
    return wp, wb, wa


def total_cost(rp, rb, ra, g: GraphData, cauchy_k: float = 1.0):
    """True robust objective: 0.5||r||² for Gaussian factors, Cauchy ρ for
    robust ones (what LM accepts/rejects steps against)."""
    k2 = cauchy_k * cauchy_k

    def block(r, robust_mask):
        e2 = jnp.sum(r * r, axis=-1)
        gauss = 0.5 * e2
        cauchy = 0.5 * k2 * jnp.log1p(e2 / k2)
        return jnp.sum(jnp.where(robust_mask, cauchy, gauss))

    cp = block(rp, jnp.zeros(rp.shape[0], bool))
    cb = block(rb, g.bet_robust & g.bet_valid)
    ca = block(ra, g.anc_valid)
    return cp + cb + ca
