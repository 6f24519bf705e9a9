"""Point-cloud geometry (reference ``warpconvnet/geometry/types/points.py``).

Batched-padded layout: coords float [B, N, 3], features [B, N, C],
num_valid [B]. Valid rows first; padding features are zero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.geometry.base import GeometryMixin, pytree_dataclass
from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.ops.morton import morton_argsort
from warpconvnet_tpu.ops.reductions import row_reduction
from warpconvnet_tpu.ops.unique import unique_coords


@pytree_dataclass(meta_fields=())
class Points(GeometryMixin):
    """Batch of point clouds.

    Attributes:
      coords: [B, N, 3] float world coordinates.
      features: [B, N, C].
      num_valid: [B] int32.
    """

    coords: jnp.ndarray
    features: jnp.ndarray
    num_valid: jnp.ndarray

    @classmethod
    def create(cls, coords, features, num_valid):
        return cls(
            coords=jnp.asarray(coords),
            features=jnp.asarray(features),
            num_valid=jnp.asarray(num_valid, jnp.int32),
        )

    def quantized_coords(self, voxel_size: float) -> jnp.ndarray:
        return jnp.floor(self.coords / voxel_size).astype(jnp.int32)

    def sort(self, voxel_size: float = 0.02, ordering: str = "xyz") -> "Points":
        """Morton-sort points by quantized coordinates (reference
        ``Points.sort``, types/points.py)."""
        int_c = self.quantized_coords(voxel_size)

        def one(ic, coords, feats, nv):
            n = ic.shape[0]
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            cmin = jnp.min(jnp.where(valid[:, None], ic, PAD_COORD), axis=0)
            shifted = jnp.where(valid[:, None], ic - cmin, PAD_COORD)
            perm, _ = morton_argsort(shifted, valid, ordering)
            return coords[perm], feats[perm]

        c, f = jax.vmap(one)(int_c, self.coords, self.features, self.num_valid)
        return self.replace(coords=c, features=f)

    def voxel_downsample(
        self,
        voxel_size: float,
        max_out: Optional[int] = None,
        reduction: str = "mean",
    ) -> "Points":
        """Average points per voxel cell; returns Points at reduced density
        (reference ``Points.voxel_downsample``). Output coords are the
        ``reduction`` of member coordinates (mean by default)."""
        max_out = max_out or self.max_num_points
        int_c = self.quantized_coords(voxel_size)

        def one(ic, coords, feats, nv):
            n = ic.shape[0]
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            res = unique_coords(ic, valid, max_out=max_out)
            red_f = row_reduction(feats, res.to_unique, max_out, reduction, counts=res.counts)
            red_c = row_reduction(coords, res.to_unique, max_out, "mean", counts=res.counts)
            return red_c, red_f, jnp.minimum(res.num_unique, max_out)

        c, f, nv = jax.vmap(one)(int_c, self.coords, self.features, self.num_valid)
        return Points(coords=c, features=f, num_valid=nv)

    def random_downsample(self, num_samples: int, key: jax.Array) -> "Points":
        """Uniformly sample ``num_samples`` valid points per scene (with
        replacement if a scene has fewer valid points)."""

        def one(coords, feats, nv, k):
            idx = jax.random.randint(k, (num_samples,), 0, jnp.maximum(nv, 1))
            return coords[idx], feats[idx]

        keys = jax.random.split(key, self.batch_size)
        c, f = jax.vmap(one)(self.coords, self.features, self.num_valid, keys)
        nv = jnp.minimum(self.num_valid, num_samples)
        return Points(coords=c, features=f, num_valid=nv)

    def to_voxels(
        self,
        voxel_size: float,
        max_out: Optional[int] = None,
        reduction: str = "mean",
    ) -> Voxels:
        """Voxelize: quantize + dedup + reduce features (reference
        ``Points.to_voxels`` -> ``points_to_voxels``, conversion/to_voxels.py)."""
        max_out = max_out or self.max_num_points
        int_c = self.quantized_coords(voxel_size)

        def one(ic, feats, nv):
            n = ic.shape[0]
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            res = unique_coords(ic, valid, max_out=max_out)
            red = row_reduction(feats, res.to_unique, max_out, reduction, counts=res.counts)
            return res.coords, red, jnp.minimum(res.num_unique, max_out)

        c, f, nv = jax.vmap(one)(int_c, self.features, self.num_valid)
        return Voxels.create(c, f, nv, voxel_size=voxel_size, tensor_stride=1)
