"""Levenberg-Marquardt pose-graph solver (matrix-free, jit-compiled).

Replaces the reference's GTSAM iSAM2 (``ltslam/src/LTslam.cpp:136-142``,
``optimizeMultisesseionGraph`` ``:157-184``).  The reference calls
``isam.update()`` six times per optimization round — effectively a batch
re-solve — so incremental relinearization buys nothing at this graph scale
(~10³-10⁴ nodes); a batch LM maps far better onto the TPU:

  * residuals/Jacobians: one vmapped evaluation of the whole factor set
    (autodiff Jacobians — no hand-derived expressions);
  * normal equations solved matrix-free by preconditioned CG, where
    ``(JᵀJ)v`` is one jvp + one vjp of the stacked residual function
    (all dense batched linear algebra on the MXU);
  * preconditioner: block-Jacobi from per-factor 6×6 autodiff blocks;
  * Cauchy robustness as IRLS reweighting, matching gtsam's m-estimator;
  * gauge handling: 1e-12-variance priors become frozen variables.

Each LM step (linearize → PCG while-loop → accept test, damping included)
compiles to one XLA program; the outer loop runs on the host.  A fully
fused 30-step device loop was measured to run long enough on
ill-conditioned graphs that the remote TPU runtime killed the worker —
and per-step host control costs only ~ms while enabling cheap early
termination.

``marginal_covariance`` provides the 6×6 marginals used by the RS-loop
information gain (reference ``isam->marginalCovariance``,
``LTslam.cpp:438-439``) via batched CG solves against unit columns.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ltm.core import se3
from ltm.core.config import SolverConfig
from ltm.graph.factors import GraphData, robust_weights, total_cost, whitened_residuals

__all__ = ["solve", "marginal_covariance", "SolveInfo"]


class SolveInfo(NamedTuple):
    cost_initial: jax.Array
    cost_final: jax.Array
    iterations: jax.Array
    cg_residual: jax.Array


# ---------------------------------------------------------------------------
# linear-algebra plumbing
# ---------------------------------------------------------------------------

def _free(delta: jax.Array, g: GraphData) -> jax.Array:
    return jnp.where(g.fixed[:, None], 0.0, delta)


def _maybe_psum(x, axis_name):
    """Cross-device reduction hook: identity on a single device, ``psum``
    over the mesh axis when the factor batches are sharded (distributed BA —
    per-shard Hessian/gradient contributions reduced over ICI)."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def _weighted_residual_fn(poses: jax.Array, g: GraphData, wb, wa):
    """Returns f(delta) -> flat residual with IRLS weights baked in."""

    def f(delta):
        p = se3.retract(poses, _free(delta, g))
        rp, rb, ra = whitened_residuals(p, g)
        rb = rb * wb[:, None]
        ra = ra * wa[:, None]
        return jnp.concatenate([rp.ravel(), rb.ravel(), ra.ravel()])

    return f


class FactorJacobians(NamedTuple):
    """Per-factor whitened+IRLS-weighted residual Jacobian blocks at δ=0.

    Validity masks and robust weights are folded in (invalid factors are
    zero blocks), so every consumer — preconditioner assembly, explicit
    gradient, explicit Gauss-Newton products — is a plain scatter-add.
    Factor variable indices live in the companion ``GraphData``.
    """

    Jp: jax.Array                     # (P, 6, 6) prior ∂r/∂δ_idx
    Jbi: jax.Array                    # (B, 6, 6) between ∂r/∂δ_i
    Jbj: jax.Array                    # (B, 6, 6) between ∂r/∂δ_j
    Jai: jax.Array                    # (A, 6, 6) anchored ∂r/∂δ_i
    Jaj: jax.Array                    # (A, 6, 6) anchored ∂r/∂δ_j
    Jaai: jax.Array                   # (A, 6, 6) anchored ∂r/∂δ_anchor_i
    Jaaj: jax.Array                   # (A, 6, 6) anchored ∂r/∂δ_anchor_j


def _factor_jacobians(poses: jax.Array, g: GraphData, wb, wa) -> FactorJacobians:
    """Vmapped autodiff Jacobians of every factor family (weights folded)."""
    # priors
    def r_prior(d, meas, x, isg):
        return se3.local(meas, se3.retract(x, d)) * isg

    Jp = jax.vmap(jax.jacfwd(r_prior), in_axes=(0, 0, 0, 0))(
        jnp.zeros((g.prior_idx.shape[0], 6), poses.dtype), g.prior_meas, poses[g.prior_idx], g.prior_inv_sigma
    )
    Jp = Jp * g.prior_valid[:, None, None]

    # betweens
    def r_bet(di, dj, meas, xi, xj, isg):
        return se3.local(meas, se3.between(se3.retract(xi, di), se3.retract(xj, dj))) * isg

    zeros_b = jnp.zeros((g.bet_i.shape[0], 6), poses.dtype)
    Jbi = jax.vmap(jax.jacfwd(r_bet, argnums=0))(zeros_b, zeros_b, g.bet_meas, poses[g.bet_i], poses[g.bet_j], g.bet_inv_sigma)
    Jbj = jax.vmap(jax.jacfwd(r_bet, argnums=1))(zeros_b, zeros_b, g.bet_meas, poses[g.bet_i], poses[g.bet_j], g.bet_inv_sigma)
    wfac = (wb * g.bet_valid)[:, None, None]
    Jbi = Jbi * wfac
    Jbj = Jbj * wfac

    # anchored betweens
    def r_anc(di, dj, dai, daj, meas, xi, xj, xai, xaj, isg):
        hi = se3.compose(se3.retract(xai, dai), se3.retract(xi, di))
        hj = se3.compose(se3.retract(xaj, daj), se3.retract(xj, dj))
        return se3.local(meas, se3.between(hi, hj)) * isg

    A = g.anc_i.shape[0]
    zeros_a = jnp.zeros((A, 6), poses.dtype)
    args = (g.anc_meas, poses[g.anc_i], poses[g.anc_j], poses[g.anc_ai], poses[g.anc_aj], g.anc_inv_sigma)
    wafac = (wa * g.anc_valid)[:, None, None]
    Ja = [jax.vmap(jax.jacfwd(r_anc, argnums=argnum))(
        zeros_a, zeros_a, zeros_a, zeros_a, *args) * wafac for argnum in range(4)]
    return FactorJacobians(Jp, Jbi, Jbj, *Ja)


def _precond_blocks(poses: jax.Array, g: GraphData, wb, wa, lam,
                    axis_name=None, tridiag: bool = False, jac: FactorJacobians = None):
    """Preconditioner blocks from per-factor autodiff Jacobians.

    Returns ``(D, L)``: ``D`` (V,6,6) = blockdiag(JᵀWJ) + lam·I, and — when
    ``tridiag`` — ``L`` (V,6,6) with ``L[v] = H[v, v-1]``, the subdiagonal
    blocks contributed by adjacent-variable between factors (the odometry
    chains).  ``D`` and ``L`` together are the EXACT normal matrix of the
    subgraph {priors, odometry betweens, λ-damping} plus the diagonal parts
    of every other factor — SPD by construction (a sum of JᵀWJ of a factor
    subset, PSD diagonal terms, and λI), so the Thomas factorization below
    needs no pivoting.  Block-Jacobi (tridiag=False) needed 100+ CG
    iterations on 500-node chains (CG residual never reached tol 1e-2 —
    measured round 4); the chain preconditioner captures the long-range
    error modes the diagonal cannot."""
    V = g.num_vars
    if jac is None:
        jac = _factor_jacobians(poses, g, wb, wa)
    Jp, Jbi, Jbj = jac.Jp, jac.Jbi, jac.Jbj
    blocks = jnp.zeros((V, 6, 6), poses.dtype)
    blocks = blocks.at[g.prior_idx].add(jnp.einsum("fij,fik->fjk", Jp, Jp, precision=jax.lax.Precision.HIGHEST))
    blocks = blocks.at[g.bet_i].add(jnp.einsum("fij,fik->fjk", Jbi, Jbi, precision=jax.lax.Precision.HIGHEST))
    blocks = blocks.at[g.bet_j].add(jnp.einsum("fij,fik->fjk", Jbj, Jbj, precision=jax.lax.Precision.HIGHEST))
    for J, idx in ((jac.Jai, g.anc_i), (jac.Jaj, g.anc_j), (jac.Jaai, g.anc_ai), (jac.Jaaj, g.anc_aj)):
        blocks = blocks.at[idx].add(jnp.einsum("fij,fik->fjk", J, J, precision=jax.lax.Precision.HIGHEST))

    L = None
    if tridiag:
        # subdiagonal: between factors connecting adjacent variables (the
        # odometry chains in the [anchors, session-0 nodes, session-1 ...]
        # layout).  H[j,i] = Σ_f J_jᵀ W J_i; non-adjacent factors scatter 0.
        L = jnp.zeros((V, 6, 6), poses.dtype)
        fwd = (g.bet_j == g.bet_i + 1)[:, None, None]
        off_ji = jnp.einsum("frj,fri->fji", Jbj, Jbi,
                            precision=jax.lax.Precision.HIGHEST)
        L = L.at[g.bet_j].add(jnp.where(fwd, off_ji, 0.0))
        rev = (g.bet_i == g.bet_j + 1)[:, None, None]
        off_ij = jnp.einsum("frj,fri->fji", Jbi, Jbj,
                            precision=jax.lax.Precision.HIGHEST)
        L = L.at[g.bet_i].add(jnp.where(rev, off_ij, 0.0))

    blocks = _maybe_psum(blocks, axis_name)
    eye = jnp.eye(6, dtype=poses.dtype)
    blocks = blocks + lam * eye
    # fixed vars: identity so the (zeroed) components stay zero
    blocks = jnp.where(g.fixed[:, None, None], eye, blocks)
    if tridiag:
        L = _maybe_psum(L, axis_name)
        # decouple the chain at fixed variables (their rows are identity)
        cut = g.fixed | jnp.roll(g.fixed, 1)
        L = jnp.where(cut[:, None, None], 0.0, L)
        L = L.at[0].set(0.0)
    return blocks, L


def _block_jacobi(poses: jax.Array, g: GraphData, wb, wa, lam, axis_name=None) -> jax.Array:
    """(V, 6, 6) inverse of blockdiag(JᵀJ) + lam I via per-factor autodiff."""
    D, _ = _precond_blocks(poses, g, wb, wa, lam, axis_name, tridiag=False)
    return jnp.linalg.inv(D)


def _tridiag_factor(D: jax.Array, L: jax.Array) -> jax.Array:
    """Block-Thomas factorization of the SPD block-tridiagonal (D, L):
    returns ``Cinv`` (V,6,6) with ``C_0 = D_0``,
    ``C_i = D_i − L_i C_{i-1}⁻¹ L_iᵀ`` — one sequential scan of 6×6 ops
    (~V tiny steps, once per LM step; the per-CG-iteration applications
    below reuse it)."""

    def step(prev_cinv, inp):
        D_i, L_i = inp
        C = D_i - jnp.matmul(
            L_i, jnp.matmul(prev_cinv, L_i.T, precision=jax.lax.Precision.HIGHEST),
            precision=jax.lax.Precision.HIGHEST)
        Cinv = jnp.linalg.inv(C)
        return Cinv, Cinv

    eye = jnp.eye(6, dtype=D.dtype)
    # unroll: a scan step's latency is ~fixed for these 6x6 ops, so 8 steps
    # per loop iteration trim the chain's sequential-latency bill (measured:
    # full bench-graph solve 5.75 -> 5.12 s — the CG cost is dominated by
    # the hvp over the factor set, not these chains, so the win is modest)
    _, Cinv = jax.lax.scan(step, eye, (D, L), unroll=8)
    return Cinv


def _tridiag_apply(Cinv: jax.Array, L: jax.Array, r: jax.Array) -> jax.Array:
    """Solve M x = r for block-tridiagonal M given its Thomas factorization:
    forward elimination then back substitution (two scans of 6×6 matvecs)."""
    mv = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def fwd(u_prev, inp):
        r_i, L_i, Cinv_i = inp
        y_i = r_i - mv(L_i, u_prev)
        return mv(Cinv_i, y_i), y_i

    # unroll=8: these two chains run EVERY CG iteration (see the note in
    # _tridiag_factor — a modest, measured latency trim)
    _, y = jax.lax.scan(fwd, jnp.zeros((6,), r.dtype), (r, L, Cinv), unroll=8)

    L_next = jnp.concatenate([L[1:], jnp.zeros((1, 6, 6), L.dtype)])

    def bwd(x_next, inp):
        y_i, Cinv_i, L_n = inp
        x_i = mv(Cinv_i, y_i - mv(L_n.T, x_next))
        return x_i, x_i

    _, x = jax.lax.scan(bwd, jnp.zeros((6,), r.dtype), (y, Cinv, L_next),
                        reverse=True, unroll=8)
    return x


_HI = jax.lax.Precision.HIGHEST


def _grad_from_jacobians(jac: FactorJacobians, rp, rbw, raw, g: GraphData) -> jax.Array:
    """Jᵀ r from explicit factor Jacobians (weights already folded into both
    the Jacobians and the residuals ``rbw``/``raw``)."""
    grad = jnp.zeros((g.num_vars, 6), rp.dtype)
    grad = grad.at[g.prior_idx].add(jnp.einsum("fij,fi->fj", jac.Jp, rp, precision=_HI))
    grad = grad.at[g.bet_i].add(jnp.einsum("fij,fi->fj", jac.Jbi, rbw, precision=_HI))
    grad = grad.at[g.bet_j].add(jnp.einsum("fij,fi->fj", jac.Jbj, rbw, precision=_HI))
    for J, idx in ((jac.Jai, g.anc_i), (jac.Jaj, g.anc_j),
                   (jac.Jaai, g.anc_ai), (jac.Jaaj, g.anc_aj)):
        grad = grad.at[idx].add(jnp.einsum("fij,fi->fj", J, raw, precision=_HI))
    return grad


def _hvp_from_jacobians(jac: FactorJacobians, g: GraphData, lam):
    """Gauss-Newton product v ↦ (JᵀWJ + λI) v from explicit factor
    Jacobians: per factor y_f = J_f v_{vars(f)} then scatter-add Jᵀ y_f.
    Mathematically identical to the jvp∘vjp of the weighted residual
    function (both are exact JᵀWJ products with IRLS weights frozen); no
    residual-function re-evaluation per CG iteration and — the point for
    the distributed solve — no cross-device reduction, since the Jacobian
    set it consumes has already been reduced once per LM step."""

    def hvp(v):
        vf = _free(v, g)
        out = jnp.zeros_like(v)
        yp = jnp.einsum("fij,fj->fi", jac.Jp, vf[g.prior_idx], precision=_HI)
        out = out.at[g.prior_idx].add(jnp.einsum("fij,fi->fj", jac.Jp, yp, precision=_HI))
        yb = (jnp.einsum("fij,fj->fi", jac.Jbi, vf[g.bet_i], precision=_HI)
              + jnp.einsum("fij,fj->fi", jac.Jbj, vf[g.bet_j], precision=_HI))
        out = out.at[g.bet_i].add(jnp.einsum("fij,fi->fj", jac.Jbi, yb, precision=_HI))
        out = out.at[g.bet_j].add(jnp.einsum("fij,fi->fj", jac.Jbj, yb, precision=_HI))
        anc = ((jac.Jai, g.anc_i), (jac.Jaj, g.anc_j),
               (jac.Jaai, g.anc_ai), (jac.Jaaj, g.anc_aj))
        ya = jnp.zeros((jac.Jai.shape[0], 6), v.dtype)
        for J, idx in anc:
            ya = ya + jnp.einsum("fij,fj->fi", J, vf[idx], precision=_HI)
        for J, idx in anc:
            out = out.at[idx].add(jnp.einsum("fij,fi->fj", J, ya, precision=_HI))
        return out + lam * v

    return hvp


def _make_preconditioner(poses, g: GraphData, wb, wa, lam, axis_name, precond: str):
    """Returns apply(r) -> M⁻¹ r for the configured preconditioner."""
    if precond == "tridiag":
        D, L = _precond_blocks(poses, g, wb, wa, lam, axis_name, tridiag=True)
        Cinv = _tridiag_factor(D, L)
        return lambda r: _tridiag_apply(Cinv, L, r)
    minv = _block_jacobi(poses, g, wb, wa, lam, axis_name)
    return lambda r: jnp.einsum("vij,vj->vi", minv, r,
                                precision=jax.lax.Precision.HIGHEST)


def _pcg(hvp, b, apply_prec, g: GraphData, iters: int, tol: float):
    """Preconditioned CG on (V, 6) tensors; fixed vars masked out."""

    def apply_m(r):
        return _free(apply_prec(r), g)

    def dot(a, b_):
        return jnp.sum(a * b_)

    x0 = jnp.zeros_like(b)
    r0 = _free(b, g)
    z0 = apply_m(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b_norm = jnp.sqrt(dot(r0, r0)) + 1e-30

    def cond(carry):
        _, _, _, _, active, it = carry
        # a while_loop, not a masked scan: each hvp is a full jvp+vjp over
        # the factor set, so converged iterations must actually STOP (under
        # vmap this runs to the slowest lane, which is still far below the
        # static cap on these block-Jacobi-preconditioned graphs)
        return active & (it < iters)

    def body(carry):
        x, r, p, rz, active, it = carry
        Ap = _free(hvp(p), g)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x1 = x + alpha * p
        r1 = r - alpha * Ap
        z1 = apply_m(r1)
        rz1 = dot(r1, z1)
        beta = rz1 / jnp.maximum(rz, 1e-30)
        p1 = z1 + beta * p
        still = jnp.sqrt(dot(r1, r1)) / b_norm > tol
        return (x1, r1, p1, rz1, still, it + 1)

    x, r, *_ = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.bool_(True), jnp.asarray(0)))
    return x, jnp.sqrt(dot(r, r)) / b_norm


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------

def _lm_step_body(g: GraphData, poses, lam, cost, cg_iterations: int,
                  cg_tol, lambda_up, lambda_down, cauchy_k, axis_name=None,
                  precond: str = "tridiag"):
    """One damped Gauss-Newton step (linearize → PCG → accept test).

    Returns (poses1, lam1, cost1, done, cg_res).  ``done``: an accepted step
    stopped improving, or the trust region collapsed (damping saturated while
    steps keep being rejected — the residual floor of noisy odometry)."""
    rp, rb, ra = whitened_residuals(poses, g)
    wp, wb, wa = robust_weights(rp, rb, ra, g, cauchy_k)

    if axis_name is None:
        # explicit-Jacobian path: one vmapped autodiff pass yields every
        # factor block, shared by gradient, Gauss-Newton products AND the
        # preconditioner (the matrix-free path below linearizes once for
        # grad/hvp and then re-derives the same Jacobians inside
        # _precond_blocks — measured 2.2x slower per LM step on the
        # two-session bench graph, tools/scaling_bench.py n=1)
        jac = _factor_jacobians(poses, g, wb, wa)
        grad = _grad_from_jacobians(jac, rp, rb * wb[:, None], ra * wa[:, None], g)
        b = -_free(grad, g)
        hvp = _hvp_from_jacobians(jac, g, lam)
        if precond == "tridiag":
            D, L = _precond_blocks(poses, g, wb, wa, lam, None, tridiag=True, jac=jac)
            Cinv = _tridiag_factor(D, L)
            apply_prec = lambda r: _tridiag_apply(Cinv, L, r)
        else:
            D, _ = _precond_blocks(poses, g, wb, wa, lam, None, jac=jac)
            minv = jnp.linalg.inv(D)
            apply_prec = lambda r: jnp.einsum("vij,vj->vi", minv, r, precision=_HI)
        delta, res = _pcg(hvp, b, apply_prec, g, cg_iterations, cg_tol)
    else:
        f = _weighted_residual_fn(poses, g, wb, wa)
        zero = jnp.zeros((g.num_vars, 6), poses.dtype)
        r0, jvp_fn = jax.linearize(f, zero)
        vjp_fn = jax.linear_transpose(jvp_fn, zero)

        grad = _maybe_psum(vjp_fn(r0)[0], axis_name)              # Jᵀ r
        b = -_free(grad, g)

        def hvp(v):
            return _maybe_psum(vjp_fn(jvp_fn(_free(v, g)))[0], axis_name) + lam * v

        apply_prec = _make_preconditioner(poses, g, wb, wa, lam, axis_name, precond)
        delta, res = _pcg(hvp, b, apply_prec, g, cg_iterations, cg_tol)

    cand = se3.retract(poses, _free(delta, g))
    new_cost = _cost_body(g, cand, cauchy_k, axis_name)
    accept = new_cost < cost
    poses1 = jnp.where(accept, cand, poses)
    lam1 = jnp.where(accept, lam * lambda_down, lam * lambda_up)
    lam1 = jnp.clip(lam1, 1e-9, 1e6)
    rel_impr = (cost - new_cost) / jnp.maximum(cost, 1e-20)
    done = (accept & (rel_impr < 1e-7)) | (~accept & (lam >= 1e6))
    cost1 = jnp.where(accept, new_cost, cost)
    return poses1, lam1, cost1, done, res


def _cost_body(g: GraphData, poses, cauchy_k, axis_name=None):
    rp, rb, ra = whitened_residuals(poses, g)
    return _maybe_psum(total_cost(rp, rb, ra, g, cauchy_k), axis_name)


_lm_step_jit = partial(jax.jit, static_argnames=("cg_iterations", "precond"))(
    lambda g, poses, lam, cost, cg_iterations, cg_tol, lambda_up, lambda_down,
    cauchy_k, precond="tridiag": _lm_step_body(
        g, poses, lam, cost, cg_iterations, cg_tol,
        lambda_up, lambda_down, cauchy_k, precond=precond))
_cost_jit = jax.jit(lambda g, poses, cauchy_k: _cost_body(g, poses, cauchy_k))


def solve(g: GraphData, cfg: SolverConfig = SolverConfig()) -> Tuple[jax.Array, SolveInfo]:
    """Optimize; returns (poses (V,4,4), SolveInfo).

    The outer LM loop runs on the HOST over a jitted per-step program (CG's
    while_loop stays inside the step).  A fully fused 30-step LM while-loop
    was a single device program whose runtime scaled with graph conditioning
    — on ill-conditioned real graphs it ran long enough that the remote TPU
    runtime's watchdog killed the worker (reproduced; a same-shape well-
    conditioned graph converged early and survived).  Per-step dispatch
    costs ~ms and buys bounded program runtime plus cheap host-side
    termination."""
    poses = jnp.asarray(g.poses0)
    lam = jnp.asarray(cfg.lambda_init, poses.dtype)
    c0 = _cost_jit(g, poses, cfg.cauchy_k)
    cost = c0
    res = jnp.asarray(0.0, poses.dtype)
    it = 0
    prev_cost = float(c0)
    stall = 0
    for it in range(1, cfg.max_outer_iterations + 1):
        poses, lam, cost, done, res = _lm_step_jit(
            g, poses, lam, cost, cfg.cg_iterations, cfg.cg_tol,
            cfg.lambda_up, cfg.lambda_down, cfg.cauchy_k,
            precond=cfg.preconditioner)
        if bool(done):
            break
        # host-side stall exit: with near-exact (tridiag-preconditioned GN)
        # steps the cost hits its f32 floor within a few iterations and LM
        # then only pumps lambda toward the trust-region-collapse exit —
        # ~14 wasted steps measured on the bench graph.  Three consecutive
        # non-improving steps end the solve at the same solution.
        c = float(cost)
        if (prev_cost - c) <= 1e-7 * max(prev_cost, 1e-20):
            stall += 1
            if stall >= 3:
                break
        else:
            stall = 0
        prev_cost = c
    return poses, SolveInfo(c0, cost, jnp.asarray(it), res)


@partial(jax.jit, static_argnames=("cg_iterations",))
def marginal_covariance(
    g: GraphData,
    poses: jax.Array,
    var_indices: jax.Array,        # (M,)
    cg_iterations: int = 200,
    damping: float = 1e-6,
    cauchy_k: float = 1.0,
) -> jax.Array:
    """(M, 6, 6) marginal covariances Σ_v = (JᵀJ)⁻¹[v, v] via batched CG.

    The RS-loop information gain needs only a handful of node marginals
    (``calcInformationGainBtnTwoNodes``, ``LTslam.cpp:419-448``); each is six
    CG solves against unit right-hand sides, batched with vmap.
    """
    rp, rb, ra = whitened_residuals(poses, g)
    _, wb, wa = robust_weights(rp, rb, ra, g, cauchy_k)
    # explicit-Jacobian operator (see _lm_step_body): one autodiff pass
    # shared by all 6·M unit-column CG solves and the preconditioner
    jac = _factor_jacobians(poses, g, wb, wa)
    hvp = _hvp_from_jacobians(jac, g, jnp.asarray(damping, poses.dtype))
    D, L = _precond_blocks(poses, g, wb, wa,
                           jnp.asarray(damping, poses.dtype), None,
                           tridiag=True, jac=jac)
    Cinv = _tridiag_factor(D, L)

    def apply_prec(r):
        return _tridiag_apply(Cinv, L, r)

    def solve_one(v_idx, k):
        e = jnp.zeros((g.num_vars, 6), poses.dtype).at[v_idx, k].set(1.0)
        x, _ = _pcg(hvp, e, apply_prec, g, cg_iterations, 1e-8)
        return x[v_idx]                           # (6,) column of Σ at var v

    cols = jax.vmap(
        lambda v: jax.vmap(lambda k: solve_one(v, k))(jnp.arange(6))
    )(var_indices)                                # (M, 6, 6) columns as rows
    # symmetrize
    return 0.5 * (cols + jnp.swapaxes(cols, -1, -2))
