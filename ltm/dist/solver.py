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
from ltm.graph.solver import SolveInfo, _solve_impl

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


def solve_sharded(g: GraphData, mesh: Mesh, cfg: SolverConfig = SolverConfig()
                  ) -> Tuple[jax.Array, SolveInfo]:
    """Distributed LM solve; bit-equivalent to the single-device result up to
    f32 reduction order."""
    n_dev = mesh.devices.size
    gp = pad_graph_for_mesh(g, n_dev)

    def spec_for(name: str):
        return P(KF_AXIS) if any(name.startswith(p) for p in _FACTOR_PREFIXES) else P()

    in_spec = GraphData(**{f.name: spec_for(f.name) for f in dataclasses.fields(GraphData)})
    out_spec = (P(), SolveInfo(P(), P(), P(), P()))

    def local(gg: GraphData):
        return _solve_impl(
            gg,
            max_outer_iterations=cfg.max_outer_iterations,
            cg_iterations=cfg.cg_iterations,
            cg_tol=cfg.cg_tol,
            lambda_init=cfg.lambda_init,
            lambda_up=cfg.lambda_up,
            lambda_down=cfg.lambda_down,
            cauchy_k=cfg.cauchy_k,
            axis_name=KF_AXIS,
        )

    fn = shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec, check_vma=False)
    return fn(gp)
