"""TRELLIS.2 shape VAE (reference ``models/trellis2/shape_vae.py`` —
FlexiDualGrid VAE: sparse-conv encoder to structured latents on active
voxels; decoder with subdivision stages emitting per-corner dual-grid values
for mesh extraction).

The decoder's output convention follows the reference: per (fine) voxel, a
signed scalar field sample + a 3-vector vertex offset (the dual-grid
"flexi" parameters mesh extraction consumes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.blocks import SparseConvNeXtBlock
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d
from warpconvnet_tpu.nn.modules.sparse_resample import (
    SparseChannel2Spatial,
    SparseSpatial2Channel,
)


class _ResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: Voxels, table=None):
        h, t = SparseConv3d(self.channels, self.channels, 3)(
            x, pair_table=table, out_coords=x if table is not None else None
        )
        f = jax.nn.silu(nn.LayerNorm()(h.features))
        h2, _ = SparseConv3d(self.channels, self.channels, 3)(
            h.replace_features(f), pair_table=t, out_coords=h
        )
        out = x.replace_features(x.features + h2.features)
        return out, t


class ShapeVaeEncoder(nn.Module):
    """Sparse voxels (fine) -> latent voxels (coarse) with mean/logvar heads
    (reference shape_vae encoder)."""

    in_channels: int
    latent_channels: int = 8
    channels: Tuple[int, ...] = (32, 64)
    blocks_per_stage: int = 1

    @nn.compact
    def __call__(self, vox: Voxels):
        h, _ = SparseConv3d(self.in_channels, self.channels[0], 3, name="stem")(vox)
        table = None
        for s, c in enumerate(self.channels):
            if s > 0:
                # spatial -> channel downsample then project
                h = SparseSpatial2Channel(name=f"s2c{s}")(h)
                h, _ = SparseConv3d(
                    h.num_channels, c, 1, name=f"proj{s}"
                )(h)
            table = None
            for i in range(self.blocks_per_stage):
                h, table = _ResBlock(c, name=f"res{s}_{i}")(h, table)
        mean, _ = SparseConv3d(
            self.channels[-1], self.latent_channels, 1, name="mean"
        )(h)
        logvar, _ = SparseConv3d(
            self.channels[-1], self.latent_channels, 1, name="logvar"
        )(h)
        return mean, logvar.features


class ShapeVaeDecoder(nn.Module):
    """Latent voxels -> subdivided dual-grid field (reference
    FlexiDualGridVaeDecoder): upsample by channel->space stages, emit
    (sdf [.,1], vertex offset [.,3]) per fine voxel."""

    latent_channels: int = 8
    channels: Tuple[int, ...] = (64, 32)
    blocks_per_stage: int = 1

    @nn.compact
    def __call__(self, z: Voxels):
        h, _ = SparseConv3d(
            self.latent_channels, self.channels[0], 3, name="stem"
        )(z)
        for s, c in enumerate(self.channels):
            if s > 0:
                # channel -> space upsample (sparse pixel shuffle)
                prev = self.channels[s - 1]
                h, _ = SparseConv3d(prev, c * 8, 1, name=f"expand{s}")(h)
                h = SparseChannel2Spatial(name=f"c2s{s}")(h)
            table = None
            for i in range(self.blocks_per_stage):
                h, table = _ResBlock(c, name=f"res{s}_{i}")(h, table)
        out, _ = SparseConv3d(
            self.channels[-1], 4, 1, use_bias=True, name="dual_head"
        )(h)
        sdf = out.features[..., :1]
        offset = jnp.tanh(out.features[..., 1:]) * 0.5
        return out.replace(features=jnp.concatenate([sdf, offset], axis=-1))


def reparameterize(key, mean_vox: Voxels, logvar: jnp.ndarray) -> Voxels:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, std.dtype)
    z = mean_vox.features + std * eps
    z = jnp.where(mean_vox.valid_mask()[..., None], z, 0)
    return mean_vox.replace(features=z)
