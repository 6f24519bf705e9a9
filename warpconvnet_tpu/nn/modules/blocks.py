"""Composite sparse blocks (reference ``nn/modules/sparse_convnext.py``,
``conv3d_blocks.py``, ``prune.py``, ``transforms.py``):

* :class:`SparseConvNeXtBlock` — depthwise 7^3 (or 3^3) conv + pointwise
  MLP with layer scale, the ConvNeXt recipe on sparse voxels.
* :class:`SparsePrune` — drop voxels by a boolean/score mask (repack valid
  rows to the front, static capacity).
* Feature transforms: :class:`ApplyFeatureTransform`, :class:`CatFeatures`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.sparse_conv import SparseDepthwiseConv3d
from warpconvnet_tpu.ops.keys import PAD_COORD


class SparseConvNeXtBlock(nn.Module):
    """Depthwise conv -> LN -> pointwise expand -> GELU -> project, with
    layer-scale residual (reference sparse_convnext block)."""

    channels: int
    kernel_size: int = 7
    expand_ratio: float = 4.0
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        h, _ = SparseDepthwiseConv3d(
            self.channels, self.kernel_size, name="dwconv"
        )(x)
        f = nn.LayerNorm()(h.features)
        f = nn.Dense(int(self.channels * self.expand_ratio))(f)
        f = jax.nn.gelu(f)
        f = nn.Dense(self.channels)(f)
        gamma = self.param(
            "layer_scale",
            nn.initializers.constant(self.layer_scale_init),
            (self.channels,),
        )
        f = x.features + gamma * f
        f = jnp.where(x.valid_mask()[..., None], f, 0)
        return x.replace(features=f)


class SparsePrune(nn.Module):
    """Keep voxels where ``keep_mask`` is True; repack survivors to the front
    (reference ``nn/modules/prune.py`` SparsePrune). Capacity is unchanged —
    the pruned set occupies a prefix, the rest is padding."""

    @nn.compact
    def __call__(self, x: Voxels, keep_mask: jnp.ndarray) -> Voxels:
        b, n, _ = x.coords.shape
        keep = keep_mask & x.valid_mask()

        def one(coords, feats, k):
            # Stable partition: kept rows first. argsort of (!keep) is stable.
            order = jnp.argsort(~k, stable=True).astype(jnp.int32)
            c = coords[order]
            f = feats[order]
            nv = jnp.sum(k.astype(jnp.int32))
            rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
            c = jnp.where((rows < nv)[:, None], c, PAD_COORD)
            f = jnp.where((rows < nv)[:, None], f, 0)
            return c, f, nv

        c, f, nv = jax.vmap(one)(x.coords, x.features, keep)
        return x.replace(coords=c, features=f, num_valid=nv)


class ApplyFeatureTransform(nn.Module):
    """Wrap an elementwise feature fn as a geometry module (reference
    ``nn/modules/transforms.py`` apply_feature_transform)."""

    transform: Callable[[jnp.ndarray], jnp.ndarray]

    @nn.compact
    def __call__(self, x):
        f = self.transform(x.features)
        f = jnp.where(x.valid_mask()[..., None], f, 0)
        return x.replace_features(f)


def cat_geometries(a, b):
    """Channel-concat features of two geometries on identical coords
    (reference transforms.cat)."""
    return a.replace_features(
        jnp.concatenate([a.features, b.features], axis=-1)
    )
