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

__all__ = ["make_mesh", "pad_to_multiple"]

KF_AXIS = "kf"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = KF_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


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
