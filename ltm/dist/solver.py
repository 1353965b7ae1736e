"""Distributed pose-graph bundle adjustment over a device mesh.

The factor batches (priors, betweens, anchored betweens) shard along their
batch axes; poses replicate.  Inside ``shard_map`` the matrix-free LM/PCG
solver runs unchanged except that gradient, Gauss-Newton products, block
preconditioner, and costs are ``psum``-reduced over the mesh axis (see
``ltm.graph.solver._maybe_psum``) — the distributed-Schur pattern of
SURVEY §2.3 realised as data-parallel normal equations over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ltm.core.config import SolverConfig
from ltm.dist.mesh import KF_AXIS
from ltm.graph.factors import GraphData
from ltm.graph.solver import SolveInfo, _cost_body, _lm_step_body

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


# (mesh, cg_iterations) -> jitted shard-mapped LM step / cost fns; cached so
# repeated solves reuse one traced program set per mesh
_STEP_CACHE: dict = {}


def _sharded_fns(mesh: Mesh, cg_iterations: int, precond: str = "tridiag"):
    key = (mesh, cg_iterations, precond)
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit
    in_spec = _graph_spec()

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
    step, cost_fn = _sharded_fns(mesh, cfg.cg_iterations, cfg.preconditioner)

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
