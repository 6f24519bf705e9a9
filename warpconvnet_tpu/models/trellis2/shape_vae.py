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


class SparseResBlockC2S(nn.Module):
    """Channel-to-spatial residual upsample block with predicted sparse
    subdivision (reference ``SparseResBlockC2S3d``, shape_vae.py:103-131):

      conv1: C -> C_out * 8 (pre-C2S), to_subdiv: C -> 8 mask logits,
      C2S(2) keeps only children with logit > 0 (or a provided mask),
      conv2 (zero-init) + repeat-broadcast skip.
    """

    channels: int
    out_channels: int
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, subdiv_mask=None):
        h, t = SparseConv3d(
            self.channels, self.out_channels * 8, 3, name="conv1"
        )(x)
        if self.pred_subdiv and subdiv_mask is None:
            logits, _ = SparseConv3d(
                self.channels, 8, 1, name="to_subdiv"
            )(x, pair_table=None)
            subdiv_mask = logits.features > 0
            # Never drop EVERY child of a valid parent (degenerate empty
            # output); keep the first child as a floor.
            any_kept = jnp.any(subdiv_mask, axis=-1, keepdims=True)
            subdiv_mask = subdiv_mask | (
                ~any_kept & (jnp.arange(8) == 0)[None, None, :]
            )
        up = SparseChannel2Spatial(name="c2s")(h, subdiv_mask=subdiv_mask)
        skip_src, _ = SparseConv3d(
            self.channels, self.out_channels * 8, 1, name="skip_proj"
        )(x)
        skip = SparseChannel2Spatial(name="c2s_skip")(
            skip_src, subdiv_mask=subdiv_mask
        )
        f = jax.nn.silu(nn.LayerNorm()(up.features))
        h2, _ = SparseConv3d(
            self.out_channels, self.out_channels, 3,
            kernel_init=nn.initializers.zeros, name="conv2",
        )(up.replace_features(f))
        return up.replace_features(skip.features + h2.features)


class ShapeVaeDecoder(nn.Module):
    """Latent voxels -> subdivided FlexiDualGrid mesh attributes (reference
    ``FlexiDualGridVaeDecoder``, shape_vae.py:255-313): upsample via
    predicted-subdivision C2S residual blocks, emit 7 channels per fine
    voxel and decode them as (vertices, intersected, quad_lerp)."""

    latent_channels: int = 8
    channels: Tuple[int, ...] = (64, 32)
    blocks_per_stage: int = 1
    voxel_margin: float = 0.5
    out_channels: int = 7

    @nn.compact
    def __call__(self, z: Voxels, upsample_times: int | None = None):
        """``upsample_times=k``: stop right after the k-th predicted-
        subdivision C2S stage and return the intermediate Voxels — the
        reference's coordinate-upsample entry for the SLat cascade
        (``SparseUnetVaeDecoder.upsample``, shape_vae.py:210-222)."""
        h, _ = SparseConv3d(
            self.latent_channels, self.channels[0], 3, name="stem"
        )(z)
        ups = 0
        for s, c in enumerate(self.channels):
            if s > 0:
                h = SparseResBlockC2S(
                    self.channels[s - 1], c, name=f"c2s_res{s}"
                )(h)
                ups += 1
            table = None
            for i in range(self.blocks_per_stage):
                h, table = _ResBlock(c, name=f"res{s}_{i}")(h, table)
            if upsample_times is not None and ups >= upsample_times:
                return h
        if upsample_times is not None:
            return h
        out, _ = SparseConv3d(
            self.channels[-1], self.out_channels, 1, use_bias=True,
            name="dual_head",
        )(h)
        return out

    @staticmethod
    def decode_attrs(h: Voxels, voxel_margin: float = 0.5):
        """Split the 7-channel output into mesh attribute Voxels (reference
        ``decode_attrs``): vertices = sigmoid-decoded offsets in
        [-margin, 1+margin]; intersected = per-axis edge logits > 0;
        quad_lerp = softplus weight."""
        f = h.features
        vertices = h.replace_features(
            (1 + 2 * voxel_margin) * jax.nn.sigmoid(f[..., 0:3]) - voxel_margin
        )
        intersected = h.replace_features(f[..., 3:6] > 0)
        quad_lerp = h.replace_features(jax.nn.softplus(f[..., 6:7]))
        return vertices, intersected, quad_lerp


def reparameterize(key, mean_vox: Voxels, logvar: jnp.ndarray) -> Voxels:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, std.dtype)
    z = mean_vox.features + std * eps
    z = jnp.where(mean_vox.valid_mask()[..., None], z, 0)
    return mean_vox.replace(features=z)
