"""Point-to-point ICP, fixed-shape and batched (the loop verifier).

Mirrors the observable semantics of PCL ``IterativeClosestPoint`` as used by
the reference (``ltslam/src/LTslam.cpp:206-217``): nearest-neighbour
correspondences (max distance 150 m — effectively all points), SVD/Umeyama
rigid update per iteration, transformation-epsilon early stop, and
``getFitnessScore()`` = mean **squared** NN distance of the aligned source.

TPU design: correspondences come from the tiled-matmul 1-NN kernel
(``ltm.kernels.knn.nn_sqdist_argmin`` — MXU-bound); the iteration loop is a
``lax.while_loop`` with per-pair convergence freeze and whole-batch early exit, so candidate
loop pairs runs under one jit/vmap (the reference parallelized this with an
OpenMP farm + mutex, ``LTslam.cpp:389-416``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ltm.core import se3
from ltm.kernels.knn import nn_sqdist_argmin

__all__ = ["ICPResult", "icp_point_to_point", "icp_batch", "fitness_score"]


CRIT_NONE = 0          # degenerate inputs — no iteration ran
CRIT_TRANSFORM_EPS = 1  # consecutive-transform change below epsilon
CRIT_ABS_MSE = 2        # |MSE_k - MSE_{k-1}| below euclidean_fitness_epsilon
CRIT_MAX_ITER = 3       # iteration budget exhausted


class ICPResult(NamedTuple):
    transform: jax.Array    # (4, 4) target_from_source correction
    converged: jax.Array    # bool — PCL hasConverged() semantics: true for any
                            # criterion exit incl. max iterations (PCL's
                            # failure_after_max_iter defaults false), false only
                            # for degenerate (empty) inputs
    fitness: jax.Array      # mean squared NN distance (PCL getFitnessScore)
    iterations: jax.Array
    criterion: jax.Array    # int32 CRIT_* — which criterion ended the loop


def _umeyama_rigid(src: jax.Array, dst: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted least-squares rigid transform dst ≈ R @ src + t (4x4)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    ws = w[:, None]
    cs = jnp.sum(src * ws, axis=0) / wsum
    cd = jnp.sum(dst * ws, axis=0) / wsum
    src_c = src - cs
    dst_c = dst - cd
    # HIGHEST: the default TPU f32 matmul truncates to bf16 — a 0.4%
    # error on the cross-covariance skews the SVD rotation estimate
    H = jnp.matmul((src_c * ws).T, dst_c,
                   precision=jax.lax.Precision.HIGHEST)  # (3, 3)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return se3.from_rot_trans(R, t)


@partial(jax.jit, static_argnames=("max_iterations", "tile", "coarse_iterations", "coarse_stride"))
def icp_point_to_point(
    src_xyz: jax.Array,      # (N, 3)
    src_mask: jax.Array,     # (N,)
    tgt_xyz: jax.Array,      # (M, 3)
    tgt_mask: jax.Array,     # (M,)
    init_transform: jax.Array | None = None,
    max_correspondence_distance: float = 150.0,
    max_iterations: int = 100,
    transformation_epsilon: float = 1e-6,
    euclidean_fitness_epsilon: float = 1e-6,
    tile: int = 4096,
    update_trim_distance: float | None = None,
    coarse_iterations: int = 0,
    coarse_stride: int = 4,
) -> ICPResult:
    """``update_trim_distance`` (optional, non-PCL extension): reject
    correspondences beyond this distance from the *rigid update* only —
    fitness keeps PCL semantics.  Improves robustness under partial overlap;
    leave None for strict reference behavior.

    ``coarse_iterations > 0`` enables a coarse-to-fine schedule: the first
    phase iterates against every ``coarse_stride``-th target point (NN cost
    scales with target size), then refines on the full target.  Final
    transform/fitness always come from full-resolution iterations.

    Convergence mirrors PCL ``DefaultConvergenceCriteria`` as configured by
    the reference (``ltslam/src/LTslam.cpp:206-211``): consecutive-transform
    epsilon OR absolute-MSE change (``setEuclideanFitnessEpsilon(1e-6)``,
    ``:210``) OR max iterations; ``converged`` follows ``hasConverged()``
    (true on any of those exits — PCL's ``failure_after_max_iter`` defaults
    false — false only for degenerate inputs), so the reference's accept test
    ``hasConverged() && fitness < thr`` (``:222``) transfers verbatim."""
    T0 = jnp.eye(4, dtype=src_xyz.dtype) if init_transform is None else init_transform
    trim = max_correspondence_distance if update_trim_distance is None else update_trim_distance
    max_d2 = jnp.minimum(max_correspondence_distance, trim) ** 2
    has_tgt = jnp.any(tgt_mask)
    has_src = jnp.any(src_mask)
    INF = jnp.asarray(jnp.inf, src_xyz.dtype)

    def run_phase(T_init, n_it_init, t_xyz, t_mask, iters):
        def cond(state):
            _, done, n_it, _, _ = state
            # under vmap this is "any lane still active": the whole batch
            # stops as soon as every member converged
            return (~done) & (n_it < iters)

        def body(state):
            T, done, n_it, prev_mse, crit = state

            def step(_):
                moved = se3.transform_points(T, src_xyz)
                d2, idx = nn_sqdist_argmin(moved, src_mask, t_xyz, t_mask, tile=tile)
                w = (src_mask & (d2 <= max_d2)).astype(src_xyz.dtype)
                dst = t_xyz[idx]
                delta = _umeyama_rigid(moved, dst, w)
                T_new = se3.compose(delta, T)
                # PCL transformation epsilon: sq diff of consecutive transforms
                dT = jnp.sum((T_new - T) ** 2)
                eps_hit = dT < transformation_epsilon
                # PCL absolute-MSE criterion (setEuclideanFitnessEpsilon):
                # |MSE_k − MSE_{k−1}| of the in-range correspondences
                mse = jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), 1.0)
                mse_hit = jnp.abs(mse - prev_mse) < euclidean_fitness_epsilon
                new_crit = jnp.where(
                    eps_hit, CRIT_TRANSFORM_EPS,
                    jnp.where(mse_hit, CRIT_ABS_MSE, crit))
                return T_new, eps_hit | mse_hit, n_it + 1, mse, new_crit

            return jax.lax.cond(done, lambda _: state, step, None)

        init = (T_init, ~(has_tgt & has_src), n_it_init, INF,
                jnp.asarray(CRIT_NONE, jnp.int32))
        return jax.lax.while_loop(cond, body, init)

    n_it0 = jnp.asarray(0)
    if coarse_iterations > 0:
        c_xyz = tgt_xyz[::coarse_stride]
        c_mask = tgt_mask[::coarse_stride]
        T0, _, n_it0, _, _ = run_phase(T0, n_it0, c_xyz, c_mask, coarse_iterations)
    T, done, n_it, _, crit = run_phase(T0, n_it0, tgt_xyz, tgt_mask, max_iterations)

    fit = fitness_score(src_xyz, src_mask, tgt_xyz, tgt_mask, T, tile=tile)
    ran = has_tgt & has_src
    crit = jnp.where(ran & ~done, CRIT_MAX_ITER, crit)
    return ICPResult(T, ran, fit, n_it, crit)


@partial(jax.jit, static_argnames=("tile",))
def fitness_score(src_xyz, src_mask, tgt_xyz, tgt_mask, T, tile: int = 4096):
    """PCL getFitnessScore: mean squared NN distance of aligned source."""
    moved = se3.transform_points(T, src_xyz)
    d2, _ = nn_sqdist_argmin(moved, src_mask, tgt_xyz, tgt_mask, tile=tile)
    w = src_mask.astype(src_xyz.dtype)
    return jnp.sum(jnp.where(src_mask, d2, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


def icp_batch(src_xyz, src_mask, tgt_xyz, tgt_mask, init_transforms=None, **kw):
    """vmapped ICP over B candidate pairs: (B,N,3),(B,N),(B,M,3),(B,M)."""
    if init_transforms is None:
        B = src_xyz.shape[0]
        init_transforms = jnp.broadcast_to(jnp.eye(4, dtype=src_xyz.dtype), (B, 4, 4))
    fn = lambda s, sm, t, tm, T0: icp_point_to_point(s, sm, t, tm, T0, **kw)
    return jax.vmap(fn)(src_xyz, src_mask, tgt_xyz, tgt_mask, init_transforms)
