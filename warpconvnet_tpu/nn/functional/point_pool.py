"""Point pooling / unpooling (reference ``nn/functional/point_pool.py:31-370``,
``point_unpool.py``).

In the padded layout, pooling is voxelize+segment-reduce; ``to_unique`` (the
per-point segment id) plays the role of the reference's ``return_to_unique``
handle and drives unpooling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.reductions import row_reduction
from warpconvnet_tpu.ops.unique import unique_coords


class PoolResult(NamedTuple):
    pooled: "Points | Voxels"
    to_unique: jnp.ndarray  # [B, N] segment id of each input point


def point_pool(
    points: Points,
    voxel_size: float,
    reduction: str = "mean",
    max_out: Optional[int] = None,
    return_type: str = "point",
) -> PoolResult:
    """Voxel-grid pooling of points (reference ``point_pool`` with
    downsample_voxel_size). return_type 'point' keeps mean world coords;
    'voxel' returns integer voxel coords."""
    max_out = max_out or points.max_num_points
    int_c = points.quantized_coords(voxel_size)

    def one(ic, coords, feats, nv):
        n = ic.shape[0]
        valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        res = unique_coords(ic, valid, max_out=max_out)
        red_f = row_reduction(feats, res.to_unique, max_out, reduction, counts=res.counts)
        red_c = row_reduction(coords, res.to_unique, max_out, "mean", counts=res.counts)
        return res.coords, red_c, red_f, jnp.minimum(res.num_unique, max_out), res.to_unique

    ic, rc, rf, nv, tu = jax.vmap(one)(int_c, points.coords, points.features, points.num_valid)
    if return_type == "voxel":
        pooled = Voxels.create(ic, rf, nv, voxel_size=voxel_size)
    else:
        pooled = Points(coords=rc, features=rf, num_valid=nv)
    return PoolResult(pooled, tu)


def point_unpool(
    pooled_features: jnp.ndarray,
    target: Points,
    to_unique: jnp.ndarray,
    mode: str = "repeat",
) -> Points:
    """Distribute pooled features back to original points
    (reference ``point_unpool``, repeat mode gathers the parent's feature)."""
    if mode != "repeat":
        raise ValueError("only 'repeat' mode is supported (zero mode == repeat of zeros)")
    cap = pooled_features.shape[1]
    safe = jnp.minimum(to_unique, cap - 1)
    rows = jnp.take_along_axis(pooled_features, safe[..., None], axis=1)
    rows = jnp.where((to_unique < cap)[..., None] & target.valid_mask()[..., None], rows, 0)
    return target.replace(features=rows)
