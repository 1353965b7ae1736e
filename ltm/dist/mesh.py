"""Device-mesh helpers for keyframe-sharded execution.

The reference's only parallelism is OpenMP threads on one host (SURVEY §2.3).
The TPU engine scales across chips with a 1-D ``jax.sharding.Mesh`` over a
``"kf"`` (keyframe/work-item) axis: keyframe sweeps, kNN queries, Scan
Context queries, and between-factor blocks are all embarrassingly parallel
along it, with a single ``psum``/OR reduction per stage riding the ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_from_config", "pad_to_multiple"]

KF_AXIS = "kf"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = KF_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def mesh_from_config(mesh_devices: Optional[int]) -> Optional[Mesh]:
    """Mesh over the first ``mesh_devices`` local devices (the drivers'
    ``cfg.mesh_devices`` contract: None/0/1 = single device, -1 = all)."""
    if not mesh_devices or mesh_devices == 1:
        return None
    devs = jax.devices()
    count = len(devs) if mesh_devices == -1 else min(mesh_devices, len(devs))
    if count <= 1:
        return None
    return make_mesh(devs[:count])


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=0):
    """Pad a leading axis to a device-count multiple (masks carry validity)."""
    import jax.numpy as jnp

    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)
