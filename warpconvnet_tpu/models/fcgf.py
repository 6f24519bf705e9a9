"""FCGF ResUNet — fully convolutional geometric features (reference
``warpconvnet/models/fcgf.py`` ``ResUNet2:37``).

Sparse-conv UNet emitting a normalized per-voxel descriptor for
correspondence/registration. Structure: conv stem, 3 strided encoder stages
with residual blocks, 3 transposed decoder stages with skip concat, 1x1 head,
L2-normalized output features.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.mink_unet import BasicBlock, ConvBlock
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d


class ResUNet2(nn.Module):
    in_channels: int = 1
    out_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    normalize_features: bool = True

    @nn.compact
    def __call__(self, x: Voxels, train: bool = True) -> Voxels:
        ch = self.channels
        h, _ = ConvBlock(self.in_channels, ch[0], 3, name="stem")(x, train=train)

        skips, tables = [], []
        for s in range(3):
            skips.append(h)
            h, t = ConvBlock(
                ch[s], ch[s + 1], 2, stride=2, name=f"down{s}"
            )(h, train=train)
            tables.append(t)
            h, _ = BasicBlock(ch[s + 1], ch[s + 1], name=f"enc{s}")(h, train=train)

        for s in reversed(range(3)):
            skip = skips[s]
            h, _ = ConvBlock(
                h.num_channels, ch[s], 2, stride=2, transposed=True,
                name=f"up{s}",
            )(h, out_coords=skip, pair_table=tables[s].reversed(), train=train)
            h = h.replace_features(
                jnp.concatenate([h.features, skip.features], axis=-1)
            )
            h, _ = BasicBlock(h.num_channels, ch[s], name=f"dec{s}")(h, train=train)

        out, _ = SparseConv3d(ch[0], self.out_channels, 1, use_bias=True,
                              name="head")(h)
        f = out.features
        if self.normalize_features:
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8
            )
            f = jnp.where(out.valid_mask()[..., None], f, 0)
        return out.replace(features=f)
