"""LT-map composition: updated "live" map from union + deltas.

Reference ``Removerter::updateCurrentMap`` (``ltremovert/src/Removerter.cpp:
1483-1524``): updated map = union(query coexist, central coexist)
+ weak-ND (reverted to static) + PD (original or strong), deduplicated at
0.05 m.  Mask formulation over the fixed concatenated [central | query]
map array.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ltm.kernels.voxel import voxel_unique_mask

__all__ = ["compose_updated_maps"]


def compose_updated_maps(
    central_xyz: jax.Array,
    query_xyz: jax.Array,
    coexist_c: jax.Array,
    nd_weak: jax.Array,
    coexist_q: jax.Array,
    pd: jax.Array,
    pd_strong: jax.Array,
    voxel: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (combined_xyz, updated_mask, updated_strong_mask)."""
    comb_xyz = jnp.concatenate([central_xyz, query_xyz], axis=0)
    upd_c = coexist_c | nd_weak
    updated = jnp.concatenate([upd_c, coexist_q | pd])
    updated = voxel_unique_mask(comb_xyz, updated, voxel)
    updated_strong = jnp.concatenate([upd_c, coexist_q | pd_strong])
    updated_strong = voxel_unique_mask(comb_xyz, updated_strong, voxel)
    return comb_xyz, updated, updated_strong
