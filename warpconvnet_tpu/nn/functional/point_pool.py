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
        # unique_coords emits first-occurrences in sorted-key order, so the
        # pooled coords are already lex-sorted — mark it so downstream convs
        # take the probe/igemm fast paths without a redundant sort.
        pooled = Voxels.create(ic, rf, nv, voxel_size=voxel_size).replace(
            lex_sorted=True
        )
    else:
        pooled = Points(coords=rc, features=rf, num_valid=nv)
    return PoolResult(pooled, tu)


def point_pool_by_code(
    points: Points,
    codes: jnp.ndarray,
    reduction: str = "mean",
    max_out: Optional[int] = None,
) -> PoolResult:
    """Pool points sharing an arbitrary integer code (reference
    ``point_pool_by_code`` — e.g. pooling by a precomputed Morton bucket or
    cluster id). codes: [B, N] int32; padding rows must carry a sentinel
    larger than any valid code."""
    from warpconvnet_tpu.ops.keys import argsort_keys, unique_mask_sorted

    max_out = max_out or points.max_num_points

    def one(code, coords, feats, nv):
        n = code.shape[0]
        valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        code = jnp.where(valid, code, jnp.iinfo(jnp.int32).max)
        skeys, perm = argsort_keys((code,))
        first = unique_mask_sorted(skeys)
        uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
        uid = jnp.zeros((n,), jnp.int32).at[perm].set(uid_sorted)
        uid = jnp.where(valid, uid, max_out)
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32), uid, num_segments=max_out + 1
        )[:max_out]
        red_f = row_reduction(feats, uid, max_out, reduction, counts=counts)
        red_c = row_reduction(coords, uid, max_out, "mean", counts=counts)
        nvu = jnp.minimum(
            jnp.sum((first & (skeys[0] < jnp.iinfo(jnp.int32).max)).astype(jnp.int32)),
            max_out,
        )
        return red_c, red_f, nvu, uid

    rc, rf, nv, tu = jax.vmap(one)(
        codes, points.coords, points.features, points.num_valid
    )
    pooled = Points(coords=rc, features=rf, num_valid=nv)
    return PoolResult(pooled, tu)


def global_scale(points, scale: jnp.ndarray):
    """Per-scene feature scaling (reference ``global_scale``): scale [B, C]
    or [B, 1] broadcast over each scene's rows."""
    f = points.features * scale[:, None, :]
    f = jnp.where(points.valid_mask()[..., None], f, 0)
    return points.replace_features(f)


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
