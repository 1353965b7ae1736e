"""Fixed-shape, mask-based point-cloud containers.

The reference system (PCL) grows/shrinks ``std::vector``-backed clouds at every
stage.  On TPU, dynamic shapes force recompilation and break fusion, so the
whole engine instead works on **padded arrays + validity masks**:

  * a cloud is ``xyz: (N, 3) float32`` + ``mask: (N,) bool`` (+ optional
    per-point payload such as intensity);
  * "removing" points flips mask bits — data never moves;
  * subset extraction (reference ``pcl::ExtractIndices``,
    ``ltremovert/src/Removerter.cpp:933-946``) is a mask AND;
  * only at I/O boundaries are clouds compacted to their valid prefix.

All ops are jit/vmap-safe.  ``PointCloud`` is a registered pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PointCloud", "concat", "pad_to", "compact", "from_numpy"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PointCloud:
    """Padded point cloud: ``xyz`` (N, 3), ``mask`` (N,), optional intensity."""

    xyz: jax.Array
    mask: jax.Array
    intensity: Optional[jax.Array] = None

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = (self.xyz, self.mask, self.intensity)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- basic properties --------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    # -- functional updates ------------------------------------------------
    def with_mask(self, mask: jax.Array) -> "PointCloud":
        return replace(self, mask=mask)

    def and_mask(self, mask: jax.Array) -> "PointCloud":
        return replace(self, mask=self.mask & mask)

    def transform(self, T: jax.Array) -> "PointCloud":
        """Rigid transform of the valid points (single matmul on MXU)."""
        from ltm.core import se3

        return replace(self, xyz=se3.transform_points(T, self.xyz))

    def masked_xyz(self, fill: float = 0.0) -> jax.Array:
        """xyz with invalid rows replaced by ``fill`` (useful before reductions)."""
        return jnp.where(self.mask[..., None], self.xyz, fill)

    # -- host-side helpers (not jittable) ----------------------------------
    def to_numpy(self) -> np.ndarray:
        """Compact to the valid points as a host (M, 3) float32 array."""
        xyz = np.asarray(self.xyz)
        mask = np.asarray(self.mask)
        return xyz[mask]

    def to_numpy_with_intensity(self) -> np.ndarray:
        xyz = np.asarray(self.xyz)
        mask = np.asarray(self.mask)
        inten = (
            np.asarray(self.intensity)
            if self.intensity is not None
            else np.zeros(xyz.shape[:-1], np.float32)
        )
        return np.concatenate([xyz[mask], inten[mask][:, None]], axis=-1)


def from_numpy(xyz: np.ndarray, capacity: Optional[int] = None, intensity=None) -> PointCloud:
    """Build a padded :class:`PointCloud` from a host (M, 3) array."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    m = xyz.shape[0]
    n = capacity if capacity is not None else m
    if m > n:
        raise ValueError(f"cloud with {m} points exceeds capacity {n}")
    pad = n - m
    xyz_p = np.pad(xyz, ((0, pad), (0, 0)))
    mask = np.zeros((n,), bool)
    mask[:m] = True
    inten_p = None
    if intensity is not None:
        intensity = np.asarray(intensity, np.float32).reshape(-1)
        inten_p = jnp.asarray(np.pad(intensity, (0, pad)))
    return PointCloud(jnp.asarray(xyz_p), jnp.asarray(mask), inten_p)


def concat(clouds: list[PointCloud]) -> PointCloud:
    """Concatenate padded clouds (capacities add; masks carried through)."""
    xyz = jnp.concatenate([c.xyz for c in clouds], axis=-2)
    mask = jnp.concatenate([c.mask for c in clouds], axis=-1)
    inten = None
    if all(c.intensity is not None for c in clouds):
        inten = jnp.concatenate([c.intensity for c in clouds], axis=-1)
    return PointCloud(xyz, mask, inten)


def pad_to(cloud: PointCloud, capacity: int) -> PointCloud:
    """Grow capacity to ``capacity`` (no-op if already there)."""
    n = cloud.capacity
    if n == capacity:
        return cloud
    if n > capacity:
        raise ValueError(f"cannot shrink padded cloud {n} -> {capacity}")
    pad = capacity - n
    xyz = jnp.concatenate([cloud.xyz, jnp.zeros((pad, 3), cloud.xyz.dtype)], axis=-2)
    mask = jnp.concatenate([cloud.mask, jnp.zeros((pad,), bool)], axis=-1)
    inten = None
    if cloud.intensity is not None:
        inten = jnp.concatenate([cloud.intensity, jnp.zeros((pad,), cloud.intensity.dtype)], axis=-1)
    return PointCloud(xyz, mask, inten)


def compact(cloud: PointCloud, capacity: int) -> PointCloud:
    """Move valid points to the front (stable) and truncate to ``capacity``.

    Jittable: uses an argsort on the inverted mask.  Useful to re-tighten a
    cloud whose mask became sparse after many partitioning stages.
    """
    order = jnp.argsort(~cloud.mask, stable=True)
    xyz = jnp.take(cloud.xyz, order, axis=-2)[:capacity]
    mask = jnp.take(cloud.mask, order, axis=-1)[:capacity]
    inten = None
    if cloud.intensity is not None:
        inten = jnp.take(cloud.intensity, order, axis=-1)[:capacity]
    return PointCloud(xyz, mask, inten)
