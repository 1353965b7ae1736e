"""Distributed pose-graph bundle adjustment over a device mesh.

The factor batches (priors, betweens, anchored betweens) shard along their
batch axes; poses replicate.  Two modes (``SolverConfig.dist_mode``):

``"schur"`` (default) — the anchor-Schur pattern of SURVEY §7: each shard
linearizes its factor subset (vmapped autodiff Jacobians + whitened IRLS
residuals), then the COMPACT linearized normal system — O(F) 6×6 blocks,
independent of CG iteration count — is reduced across the mesh in ONE
collective wave per LM step; every device then solves the replicated
reduced system locally, eliminating the per-session odometry chains
directly by the block-Thomas factorization (``_tridiag_factor``) and
running CG with explicit-Jacobian Gauss-Newton products that need no
communication at all.  A further reduction to the 6·S-anchor system alone
is NOT exact here: the anchored between factor
(``ltslam/include/ltslam/BetweenFactorWithAnchoring.h:86-100``) couples a
node of session i to a node of session j directly, so H_nn is not
session-separable and eliminating it exactly is general sparse
factorization; reducing the compact factor system once and eliminating
chains locally achieves the same collective complexity (O(1) rounds per
LM step vs O(CG iterations)) without approximation.  Collectives per LM
step: one all-gather wave (~1 MB at the bench graph's ~1.5k factors) + one
psum (candidate-cost accept test).

``"allreduce"`` — the round-2 path kept for comparison: the matrix-free
LM/PCG solver runs unchanged with gradient, Gauss-Newton products, block
preconditioner, and costs ``psum``-reduced over the mesh axis (see
``ltm.graph.solver._maybe_psum``) — 2 all-reduces per CG *iteration*,
measured collective-latency-bound beyond n=2 (PERF.md scaling table).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ltm.core import se3
from ltm.core.config import SolverConfig
from ltm.dist.mesh import KF_AXIS
from ltm.graph.factors import GraphData, robust_weights, whitened_residuals
from ltm.graph.solver import (
    FactorJacobians,
    SolveInfo,
    _cost_body,
    _factor_jacobians,
    _free,
    _grad_from_jacobians,
    _hvp_from_jacobians,
    _lm_step_body,
    _pcg,
    _precond_blocks,
    _tridiag_apply,
    _tridiag_factor,
)

__all__ = ["pad_graph_for_mesh", "solve_sharded"]

_FACTOR_PREFIXES = ("prior_", "bet_", "anc_")


def _pad_field(name: str, arr: jax.Array, multiple: int) -> jax.Array:
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    if name.endswith("_meas"):
        fill = jnp.broadcast_to(jnp.eye(4, dtype=arr.dtype), (pad, 4, 4))
        return jnp.concatenate([arr, fill], axis=0)
    widths = [(0, 0)] * arr.ndim
    widths[0] = (0, pad)
    return jnp.pad(arr, widths)          # idx->0, valid->False, sigmas->0


def pad_graph_for_mesh(g: GraphData, n_devices: int) -> GraphData:
    """Pad every factor batch to a device-count multiple (padding invalid;
    measurements pad with identity so SE(3) kernels stay NaN-free)."""
    updates = {}
    for f in dataclasses.fields(g):
        if any(f.name.startswith(p) for p in _FACTOR_PREFIXES):
            updates[f.name] = _pad_field(f.name, getattr(g, f.name), n_devices)
    return dataclasses.replace(g, **updates)


def _graph_spec():
    def spec_for(name: str):
        return P(KF_AXIS) if any(name.startswith(p) for p in _FACTOR_PREFIXES) else P()

    return GraphData(**{f.name: spec_for(f.name) for f in dataclasses.fields(GraphData)})


def _lm_step_schur_body(gg: GraphData, poses, lam, cost, cg_iterations: int,
                        cg_tol, lambda_up, lambda_down, cauchy_k,
                        axis_name=KF_AXIS):
    """One LM step, anchor-Schur style (see module docstring).

    ``gg`` holds this device's factor shard (replicated poses/fixed).  The
    step is numerically the same damped Gauss-Newton step as
    ``_lm_step_body`` — same IRLS weights, same exact JᵀWJ operator, same
    chain preconditioner, same accept/damping logic — with the collective
    pattern inverted: reduce the linearization once, then solve locally.
    """
    # ---- local: linearize this shard's factors --------------------------
    rp, rb, ra = whitened_residuals(poses, gg)
    _, wb, wa = robust_weights(rp, rb, ra, gg, cauchy_k)
    jac = _factor_jacobians(poses, gg, wb, wa)
    rbw = rb * wb[:, None]
    raw = ra * wa[:, None]

    # ---- ONE collective wave: replicate the compact linearized system ---
    def ag(x):
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)

    jac_f = FactorJacobians(*(ag(x) for x in jac))
    rp_f, rbw_f, raw_f = ag(rp), ag(rbw), ag(raw)
    # gathered index/validity fields give a full-graph view for the scatter
    # indices; meas/inv_sigma stay shard-local (never read below — only the
    # local ``gg`` evaluates residuals, for the accept-test cost)
    gf = dataclasses.replace(
        gg,
        prior_idx=ag(gg.prior_idx), prior_valid=ag(gg.prior_valid),
        bet_i=ag(gg.bet_i), bet_j=ag(gg.bet_j),
        bet_valid=ag(gg.bet_valid), bet_robust=ag(gg.bet_robust),
        anc_i=ag(gg.anc_i), anc_j=ag(gg.anc_j),
        anc_ai=ag(gg.anc_ai), anc_aj=ag(gg.anc_aj), anc_valid=ag(gg.anc_valid),
    )

    # ---- replicated local solve: chain elimination + comm-free CG -------
    D, L = _precond_blocks(poses, gf, None, None, lam, None, tridiag=True,
                           jac=jac_f)
    Cinv = _tridiag_factor(D, L)
    grad = _grad_from_jacobians(jac_f, rp_f, rbw_f, raw_f, gf)
    b = -_free(grad, gf)
    hvp = _hvp_from_jacobians(jac_f, gf, lam)
    delta, res = _pcg(hvp, b, lambda r: _tridiag_apply(Cinv, L, r), gf,
                      cg_iterations, cg_tol)

    cand = se3.retract(poses, _free(delta, gf))
    new_cost = _cost_body(gg, cand, cauchy_k, axis_name)   # one psum
    accept = new_cost < cost
    poses1 = jnp.where(accept, cand, poses)
    lam1 = jnp.where(accept, lam * lambda_down, lam * lambda_up)
    lam1 = jnp.clip(lam1, 1e-9, 1e6)
    rel_impr = (cost - new_cost) / jnp.maximum(cost, 1e-20)
    done = (accept & (rel_impr < 1e-7)) | (~accept & (lam >= 1e6))
    cost1 = jnp.where(accept, new_cost, cost)
    return poses1, lam1, cost1, done, res


# (mesh, cg_iterations, precond, mode) -> jitted shard-mapped LM step / cost
# fns; cached so repeated solves reuse one traced program set per mesh
_STEP_CACHE: dict = {}


def _sharded_fns(mesh: Mesh, cg_iterations: int, precond: str = "tridiag",
                 mode: str = "schur"):
    key = (mesh, cg_iterations, precond, mode)
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit
    in_spec = _graph_spec()

    if mode == "schur":
        def local_step(gg, poses, lam, cost, cg_tol, lambda_up, lambda_down, cauchy_k):
            return _lm_step_schur_body(gg, poses, lam, cost, cg_iterations,
                                       cg_tol, lambda_up, lambda_down, cauchy_k)
    else:
        def local_step(gg, poses, lam, cost, cg_tol, lambda_up, lambda_down, cauchy_k):
            return _lm_step_body(gg, poses, lam, cost, cg_iterations, cg_tol,
                                 lambda_up, lambda_down, cauchy_k, axis_name=KF_AXIS,
                                 precond=precond)

    def local_cost(gg, poses, cauchy_k):
        return _cost_body(gg, poses, cauchy_k, axis_name=KF_AXIS)

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(in_spec, P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False))
    cost = jax.jit(shard_map(
        local_cost, mesh=mesh, in_specs=(in_spec, P(), P()),
        out_specs=P(), check_vma=False))
    _STEP_CACHE[key] = (step, cost)
    return step, cost


def solve_sharded(g: GraphData, mesh: Mesh, cfg: SolverConfig = SolverConfig()
                  ) -> Tuple[jax.Array, SolveInfo]:
    """Distributed LM solve; bit-equivalent to the single-device result up to
    f32 reduction order.  Outer LM iterations host-loop over a shard-mapped
    per-step program (see ``ltm.graph.solver.solve`` for why)."""
    n_dev = mesh.devices.size
    gp = pad_graph_for_mesh(g, n_dev)
    step, cost_fn = _sharded_fns(mesh, cfg.cg_iterations, cfg.preconditioner,
                                 getattr(cfg, "dist_mode", "schur"))

    poses = jnp.asarray(gp.poses0)
    lam = jnp.asarray(cfg.lambda_init, poses.dtype)
    c0 = cost_fn(gp, poses, cfg.cauchy_k)
    cost = c0
    res = jnp.asarray(0.0, poses.dtype)
    it = 0
    prev_cost = float(c0)
    stall = 0
    for it in range(1, cfg.max_outer_iterations + 1):
        poses, lam, cost, done, res = step(
            gp, poses, lam, cost, cfg.cg_tol, cfg.lambda_up,
            cfg.lambda_down, cfg.cauchy_k)
        if bool(done):
            break
        # host-side stall exit (same rule as ltm.graph.solver.solve)
        c = float(cost)
        if (prev_cost - c) <= 1e-7 * max(prev_cost, 1e-20):
            stall += 1
            if stall >= 3:
                break
        else:
            stall = 0
        prev_cost = c
    return poses, SolveInfo(c0, cost, jnp.asarray(it), res)
