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


def _cofactor(X: jax.Array) -> jax.Array:
    """Cofactor matrix of a 3x3: rows are cross products of X's other rows,
    so ``X^{-T} = cof(X) / det(X)`` with no elimination step."""
    return jnp.stack([
        jnp.cross(X[1], X[2]),
        jnp.cross(X[2], X[0]),
        jnp.cross(X[0], X[1]),
    ])


def _opt_rotation(H: jax.Array) -> jax.Array:
    """Optimal rotation of the Umeyama problem from ``H = Σ w·src·dstᵀ``.

    The textbook route (SVD of H, ``R = V·diag(1,1,±1)·Uᵀ``) is numerically
    wrong on TPU: XLA's f32 3x3 SVD returns factors with ~2e-3 orthonormality
    error (measured — trace(RᵀR) off by 4e-3), so every ICP iteration
    injected milliradian-scale spurious rotation, which at 50-100 m lever
    arms moves points centimetres: correspondences never settled and every
    pair ran to the 100-iteration PCL cap (rounds 2-3 bench).

    Instead: R = the orthogonal polar factor of Hᵀ (equal to V·Uᵀ exactly),
    by Higham's determinantally-scaled Newton iteration
    ``X ← (γX + (γX)^{-T})/2``, ``γ = |det X|^{-1/3}`` — quadratically
    convergent, f32-exact (orthonormality ~1e-7 measured up to cond 5e6),
    and 3x3-cofactor cheap next to the NN matmul.  The SVD path survives
    only as the reflection/rank-deficient fallback (det(H) ≤ 0), where the
    polar factor would be improper — unreachable for real correspondence
    sets, kept for total safety."""
    A = H.T
    nf = jnp.sqrt(jnp.sum(A * A))
    X0 = A / jnp.maximum(nf, 1e-30)
    det0 = jnp.sum(X0[0] * jnp.cross(X0[1], X0[2]))

    def body(X, _):
        det = jnp.sum(X[0] * jnp.cross(X[1], X[2]))
        safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        XinvT = _cofactor(X) / safe
        g = jnp.abs(safe) ** (-1.0 / 3.0)
        return 0.5 * (g * X + XinvT / g), None

    R_polar, _ = jax.lax.scan(body, X0, None, length=9)

    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R_svd = Vt.T @ D @ U.T
    return jnp.where(det0 > 1e-12, R_polar, R_svd)


def _umeyama_rigid(src: jax.Array, dst: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted least-squares rigid transform dst ≈ R @ src + t (4x4)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    ws = w[:, None]
    cs = jnp.sum(src * ws, axis=0) / wsum
    cd = jnp.sum(dst * ws, axis=0) / wsum
    src_c = src - cs
    dst_c = dst - cd
    # HIGHEST: the default TPU f32 matmul truncates to bf16 — a 0.4%
    # error on the cross-covariance skews the rotation estimate
    H = jnp.matmul((src_c * ws).T, dst_c,
                   precision=jax.lax.Precision.HIGHEST)  # (3, 3)
    R = _opt_rotation(H)
    t = cd - R @ cs
    return se3.from_rot_trans(R, t)


def _transform_eps_hit(delta: jax.Array, transformation_epsilon) -> jax.Array:
    """PCL DefaultConvergenceCriteria transform test on the INCREMENTAL
    per-iteration transform (``default_convergence_criteria.hpp``):
    ``cos_angle = (trace(R)-1)/2 >= rotation_threshold`` AND squared step
    translation ``<= translation_threshold``, with IterativeClosestPoint
    wiring ``rotation_threshold = 1 - transformation_epsilon`` and
    ``translation_threshold = transformation_epsilon`` (``icp.hpp``).  The
    delta is ≈identity at convergence whatever the absolute pose, so the test
    is f32-meaningful (unlike a difference of absolute transforms)."""
    cos_angle = 0.5 * (delta[0, 0] + delta[1, 1] + delta[2, 2] - 1.0)
    trans_sqr = jnp.sum(delta[:3, 3] ** 2)
    return (cos_angle >= 1.0 - transformation_epsilon) & \
        (trans_sqr <= transformation_epsilon)


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
    the reference (``ltslam/src/LTslam.cpp:206-211``).  PCL's transform test
    examines the INCREMENTAL per-iteration transform (``transformation_`` in
    ``icp.hpp``'s loop): rotation via ``cos_angle = (trace(R)-1)/2 >=
    1 - transformation_epsilon`` and squared translation norm ``<=
    transformation_epsilon`` (``setTranslationThreshold(transformation_eps)``
    / ``setRotationThreshold(1 - transformation_eps)``), OR the MSE-change
    criterion (``setEuclideanFitnessEpsilon(1e-6)``, ``:210`` →
    ``|MSE_k - MSE_{k-1}| < eps``), OR max iterations.  Testing the
    incremental delta — which is ≈identity at convergence regardless of pose
    magnitude — is also what makes the criterion meaningful in f32: a
    difference of absolute 4x4 matrices carries the pose's translation scale
    and in f32 never sinks below 1e-6 at tens-of-metre translations (PCL
    evaluates in double).  ``converged`` follows ``hasConverged()`` (true on
    any criterion exit — PCL's ``failure_after_max_iter`` defaults false —
    false only for degenerate inputs), so the reference's accept test
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
                eps_hit = _transform_eps_hit(delta, transformation_epsilon)
                # PCL MSE-change criterion (setEuclideanFitnessEpsilon):
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


@partial(jax.jit, static_argnames=("iterations", "tile"))
def _icp_segment(src_xyz, src_mask, tgt_xyz, tgt_mask, T, done, n_it, prev_mse,
                 crit, it_cap, max_corr_sq, transformation_epsilon,
                 euclidean_fitness_epsilon, iterations, tile):
    """Up to ``iterations`` more ICP iterations from a carried state —
    bitwise the same update sequence as :func:`icp_point_to_point`'s inner
    loop (each pair's trajectory is independent of how pairs are batched),
    just resumable.  ``it_cap`` is the pair's absolute iteration budget."""

    def cond(state):
        _, done_, n_it_, _, _, k = state
        return (~done_) & (n_it_ < it_cap) & (k < iterations)

    def body(state):
        T_, done_, n_it_, prev_mse_, crit_, k = state
        moved = se3.transform_points(T_, src_xyz)
        d2, idx = nn_sqdist_argmin(moved, src_mask, tgt_xyz, tgt_mask, tile=tile)
        w = (src_mask & (d2 <= max_corr_sq)).astype(src_xyz.dtype)
        dst = tgt_xyz[idx]
        delta = _umeyama_rigid(moved, dst, w)
        T_new = se3.compose(delta, T_)
        eps_hit = _transform_eps_hit(delta, transformation_epsilon)
        mse = jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), 1.0)
        mse_hit = jnp.abs(mse - prev_mse_) < euclidean_fitness_epsilon
        new_crit = jnp.where(eps_hit, CRIT_TRANSFORM_EPS,
                             jnp.where(mse_hit, CRIT_ABS_MSE, crit_))
        return T_new, eps_hit | mse_hit, n_it_ + 1, mse, new_crit, k + 1

    T, done, n_it, prev_mse, crit, _ = jax.lax.while_loop(
        cond, body, (T, done, n_it, prev_mse, crit, jnp.asarray(0)))
    return T, done, n_it, prev_mse, crit


@partial(jax.jit, static_argnames=("iterations", "tile"))
def _icp_segment_batch(src, sm, tgt, tm, T, done, n_it, prev_mse, crit,
                       it_cap, max_corr_sq, trans_eps, fit_eps,
                       iterations: int, tile: int):
    def one(s, m, t, tm_, T_, d_, n_, p_, c_):
        return _icp_segment(s, m, t, tm_, T_, d_, n_, p_, c_, it_cap,
                            max_corr_sq, trans_eps, fit_eps, iterations, tile)

    return jax.vmap(one)(src, sm, tgt, tm, T, done, n_it, prev_mse, crit)


def icp_batch_compacted(src_xyz, src_mask, tgt_xyz, tgt_mask,
                        init_transforms=None,
                        max_correspondence_distance: float = 150.0,
                        max_iterations: int = 100,
                        transformation_epsilon: float = 1e-6,
                        euclidean_fitness_epsilon: float = 1e-6,
                        tile: int = 4096,
                        update_trim_distance: float | None = None,
                        segment: int = 25,
                        width: int = 32,
                        **_ignored) -> ICPResult:
    """B independent ICPs with lane compaction: iterate all pairs in
    ``segment``-iteration rounds and repack only the unconverged pairs for
    the next round.  A fused per-chunk while_loop runs every chunk to its
    slowest lane (with p90 at the iteration cap nearly every chunk contains
    a straggler — ~40% wasted lane-iterations measured on the slam bench);
    compaction retires converged pairs at segment granularity instead.
    Results are BITWISE those of :func:`icp_batch`: each pair's update
    sequence does not depend on batching.

    ``coarse_iterations`` is not supported here (the driver keeps the fused
    path when it is enabled)."""
    B = src_xyz.shape[0]
    if init_transforms is None:
        init_transforms = jnp.broadcast_to(
            jnp.eye(4, dtype=src_xyz.dtype), (B, 4, 4))
    trim = max_correspondence_distance if update_trim_distance is None else update_trim_distance
    max_d2 = float(min(max_correspondence_distance, trim)) ** 2

    import numpy as np

    T = jnp.asarray(init_transforms)
    has = np.asarray(jax.jit(jax.vmap(lambda sm, tm: jnp.any(sm) & jnp.any(tm)))(
        src_mask, tgt_mask))
    done = jnp.asarray(~has)
    n_it = jnp.zeros((B,), jnp.int32)
    prev_mse = jnp.full((B,), jnp.inf, src_xyz.dtype)
    crit = jnp.full((B,), CRIT_NONE, jnp.int32)

    active = np.flatnonzero(has)
    while active.size:
        for c0 in range(0, active.size, width):
            idx_np = active[c0: c0 + width]
            pad = width - idx_np.size
            if pad:
                idx_np = np.concatenate([idx_np, np.repeat(idx_np[-1:], pad)])
            idx = jnp.asarray(idx_np)
            out = _icp_segment_batch(
                src_xyz[idx], src_mask[idx], tgt_xyz[idx], tgt_mask[idx],
                T[idx], done[idx], n_it[idx], prev_mse[idx], crit[idx],
                jnp.asarray(max_iterations), max_d2, transformation_epsilon,
                euclidean_fitness_epsilon, iterations=segment, tile=tile)
            # full-width scatter: pad entries duplicate the last real lane
            # and its vmapped result is identical in every duplicate, so
            # scattering all ``width`` rows writes the same values — while a
            # ``[:n_real]``-sliced scatter compiles a NEW program per
            # distinct n_real (one per partial-chunk size; measured seconds
            # of compile each on a remote backend for zero device work)
            T = T.at[idx].set(out[0])
            done = done.at[idx].set(out[1])
            n_it = n_it.at[idx].set(out[2])
            prev_mse = prev_mse.at[idx].set(out[3])
            crit = crit.at[idx].set(out[4])
        done_h = np.asarray(done)
        it_h = np.asarray(n_it)
        active = np.flatnonzero(has & ~done_h & (it_h < max_iterations))

    crit = jnp.where(jnp.asarray(has) & ~done, CRIT_MAX_ITER, crit)
    fits = []
    for c0 in range(0, B, width):
        sl = slice(c0, min(c0 + width, B))
        if not has[sl].any():
            # all-empty chunk (lane-bucket padding): fitness is 0 by
            # definition and the kernel's cost is shape-fixed — skip it
            fits.append(jnp.zeros((sl.stop - sl.start,), src_xyz.dtype))
            continue
        fits.append(jax.vmap(partial(fitness_score, tile=tile))(
            src_xyz[sl], src_mask[sl], tgt_xyz[sl], tgt_mask[sl], T[sl]))
    fit = jnp.concatenate(fits) if fits else jnp.zeros((0,), src_xyz.dtype)
    return ICPResult(T, jnp.asarray(has), fit, n_it, crit)


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
