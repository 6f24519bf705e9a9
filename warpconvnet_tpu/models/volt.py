"""Volt — voxel transformer with K^3 patch tokenization (reference
``warpconvnet/models/volt/`` ``Volt:353``; ScanNet val mIoU table in the
reference's models/volt/README.md).

Architecture: sparse conv stem -> K^3-patch tokenizer (stride-K sparse
reduce = token per occupied K^3 cell) -> ViT trunk with global attention and
axial (3D) RoPE -> token-to-voxel unpooling + conv head. Variants with conv
blocks interleaved ("convblock") and windowed attention ("blockattn") mirror
the reference's ablations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_pool import sparse_reduce, sparse_unpool
from warpconvnet_tpu.nn.modules.attention import Attention, FeedForward
from warpconvnet_tpu.nn.modules.blocks import SparseConvNeXtBlock
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d


class VoltBlock(nn.Module):
    """Pre-norm global-attention transformer block with 3D RoPE on token
    coordinates (reference volt transformer block)."""

    dim: int
    num_heads: int = 8
    rope_base: Optional[float] = 100.0
    hidden_ratio: float = 4.0

    @nn.compact
    def __call__(self, tokens: Voxels) -> Voxels:
        x = tokens.features
        mask = tokens.valid_mask()
        a = Attention(
            self.dim, self.num_heads, rope_base=self.rope_base, name="attn"
        )(nn.LayerNorm()(x), mask, tokens.coords)
        x = x + a
        x = x + FeedForward(self.dim, self.hidden_ratio, name="mlp")(
            nn.LayerNorm()(x)
        )
        x = jnp.where(mask[..., None], x, 0)
        return tokens.replace(features=x)


class Volt(nn.Module):
    """Reference ``Volt:353``. Returns per-voxel logits."""

    in_channels: int
    out_channels: int
    patch_size: int = 4
    dim: int = 192
    depth: int = 12
    num_heads: int = 6
    stem_dim: int = 64
    use_conv_blocks: bool = False  # "convblock" variant
    conv_every: int = 4
    token_capacity: Optional[int] = None

    @nn.compact
    def __call__(self, vox: Voxels, train: bool = True) -> Voxels:
        # Stem: two submanifold convs at full resolution.
        h, t0 = SparseConv3d(self.in_channels, self.stem_dim, 3, name="stem1")(vox)
        h = h.replace_features(jax.nn.gelu(nn.LayerNorm()(h.features)))
        h, _ = SparseConv3d(self.stem_dim, self.stem_dim, 3, name="stem2")(
            h, pair_table=t0, out_coords=h
        )
        h = h.replace_features(nn.LayerNorm()(h.features))

        # K^3 tokenizer: mean-reduce each occupied patch cell, then project.
        tokens, pool_table = sparse_reduce(
            h, self.patch_size, self.patch_size, "mean",
            out_capacity=self.token_capacity,
        )
        tokens = tokens.replace_features(
            nn.Dense(self.dim, name="tok_proj")(tokens.features)
        )

        # ViT trunk with global attention.
        for i in range(self.depth):
            tokens = VoltBlock(self.dim, self.num_heads, name=f"block{i}")(tokens)
            if self.use_conv_blocks and (i + 1) % self.conv_every == 0:
                tokens = SparseConvNeXtBlock(
                    self.dim, kernel_size=3, name=f"conv{i}"
                )(tokens)

        tokens = tokens.replace_features(nn.LayerNorm()(tokens.features))

        # Token -> voxel unpooling + skip fuse + head.
        up = sparse_unpool(tokens, h, pool_table, concat_features=h.features)
        f = nn.Dense(self.stem_dim, name="fuse")(up.features)
        f = jax.nn.gelu(f)
        out, _ = SparseConv3d(
            self.stem_dim, self.out_channels, 1, use_bias=True, name="head"
        )(up.replace_features(f))
        return out
