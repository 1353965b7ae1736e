"""Pose-graph checkpoint/resume.

The reference's only resume mechanism is the file protocol between modules
(stage outputs re-read from disk; SURVEY §5).  In addition to that, the
solver state here checkpoints to a single ``.npz``: variable estimates +
every factor batch — enough to resume optimization, re-run RS-loop search,
or audit the exact graph that produced a trajectory.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ltm.graph.factors import GraphData

__all__ = ["save_graph", "load_graph"]


def save_graph(path: str, g: GraphData, poses=None, meta: dict | None = None) -> None:
    arrays = {f.name: np.asarray(getattr(g, f.name)) for f in dataclasses.fields(g)}
    if poses is not None:
        arrays["__estimates__"] = np.asarray(poses)
    if meta:
        for k, v in meta.items():
            arrays[f"__meta_{k}__"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_graph(path: str):
    """-> (GraphData, estimates or None, meta dict)."""
    import jax.numpy as jnp

    data = np.load(path)
    fields = {f.name for f in dataclasses.fields(GraphData)}
    kwargs = {k: jnp.asarray(v) for k, v in data.items() if k in fields}
    g = GraphData(**kwargs)
    est = jnp.asarray(data["__estimates__"]) if "__estimates__" in data else None
    meta = {k[len("__meta_"):-2]: data[k] for k in data.files if k.startswith("__meta_")}
    return g, est, meta
