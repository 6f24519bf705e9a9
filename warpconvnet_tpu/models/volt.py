"""Volt — voxel transformer with K^3 patch tokenization (reference
``warpconvnet/models/volt/`` ``Volt:353``; variant table with ScanNet val
mIoU in the reference's models/volt/README.md — volt-s 76.06 ... best
volt-b-convblock 78.23).

Architecture: sparse conv stem -> K^3-patch tokenizer (stride-K sparse
reduce = token per occupied K^3 cell) -> ViT trunk with global per-scene
attention (segment-id flash attention) and axial 3D RoPE -> token-to-voxel
unpooling + conv head.

The reference's full ablation family is exposed through the same single
keyword knobs (``build_volt`` / ``VOLT_VARIANTS``):
* ``tokenizer_type`` — "linear" | "convblock" (ResNet-style non-strided
  SparseConv3d stem adding local context before the patch embed,
  reference ``ConvBlockTokenizer:224``);
* ``conv_before_attn`` — per-block stride-1 SparseConv3d residual on the
  token grid before attention (reference ``TokenConv:188`` in ``Block:265``);
* ``dim`` / ``num_heads`` — model scale (384/6 = volt-s, 768/12 = volt-b);
* DropPath + LayerScale regularization (reference ``DropPath:44``,
  ``LayerScale:69``).
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


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference ``DropPath:44``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class LayerScale(nn.Module):
    """Learned per-channel residual scale (reference ``LayerScale:69``)."""

    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma", lambda _, s: jnp.full(s, self.init), (self.dim,)
        )
        return x * gamma


class TokenConv(nn.Module):
    """Stride-1 sparse conv residual on the token grid — the
    ``conv_before_attn`` local-mixing path (reference ``TokenConv:188``)."""

    dim: int

    @nn.compact
    def __call__(self, tokens: Voxels) -> Voxels:
        h, _ = SparseConv3d(self.dim, self.dim, 3, name="conv")(tokens)
        f = tokens.features + jax.nn.gelu(nn.LayerNorm()(h.features))
        f = jnp.where(tokens.valid_mask()[..., None], f, 0)
        return tokens.replace(features=f)


class VoltBlock(nn.Module):
    """Pre-norm global-attention transformer block with 3D RoPE on token
    coordinates; optional pre-attention token conv, LayerScale, DropPath
    (reference ``Block:265``)."""

    dim: int
    num_heads: int = 8
    rope_base: Optional[float] = 100.0
    hidden_ratio: float = 4.0
    conv_before_attn: bool = False
    drop_path: float = 0.0
    layer_scale: Optional[float] = None

    @nn.compact
    def __call__(self, tokens: Voxels, train: bool = True) -> Voxels:
        if self.conv_before_attn:
            tokens = TokenConv(self.dim, name="token_conv")(tokens)
        x = tokens.features
        mask = tokens.valid_mask()
        a = Attention(
            self.dim, self.num_heads, rope_base=self.rope_base, name="attn"
        )(nn.LayerNorm()(x), mask, tokens.coords)
        if self.layer_scale is not None:
            a = LayerScale(self.dim, self.layer_scale, name="ls1")(a)
        x = x + DropPath(self.drop_path, name="dp1")(a, train)
        m = FeedForward(self.dim, self.hidden_ratio, name="mlp")(nn.LayerNorm()(x))
        if self.layer_scale is not None:
            m = LayerScale(self.dim, self.layer_scale, name="ls2")(m)
        x = x + DropPath(self.drop_path, name="dp2")(m, train)
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
    tokenizer_type: str = "linear"  # "linear" | "convblock"
    conv_before_attn: bool = False
    use_conv_blocks: bool = False  # interleaved ConvNeXt blocks variant
    conv_every: int = 4
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
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

        if self.tokenizer_type == "convblock":
            # ResNet-style non-strided conv stem adding local context before
            # the patch embed (reference ConvBlockTokenizer:224).
            r, _ = SparseConv3d(self.stem_dim, self.stem_dim, 3,
                                name="tok_conv1")(h, pair_table=t0, out_coords=h)
            r = r.replace_features(jax.nn.gelu(nn.LayerNorm()(r.features)))
            r, _ = SparseConv3d(self.stem_dim, self.stem_dim, 3,
                                name="tok_conv2")(r, pair_table=t0, out_coords=r)
            h = h.replace_features(
                nn.LayerNorm()(h.features + r.features)
            )

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
            tokens = VoltBlock(
                self.dim, self.num_heads,
                conv_before_attn=self.conv_before_attn,
                drop_path=self.drop_path * i / max(self.depth - 1, 1),
                layer_scale=self.layer_scale,
                name=f"block{i}",
            )(tokens, train)
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


# Reference models/volt/README.md variant table (ScanNet v2 val mIoU w/ TTA):
# volt-s 76.06, volt-convattn 76.41, volt-b 76.53, volt-convblock 77.01,
# volt-all3 77.93, volt-blockattn 78.00, volt-b-convblock 78.23.
#
# NOTE on "volt-blockattn": despite the name, the reference defines this
# variant as convblock tokenizer + conv_before_attn at base width — NOT a
# windowed/block attention scheme (reference models/volt/__init__.py:46-48:
# ``"volt-blockattn": dict(tokenizer_type="convblock",
# conv_before_attn=True)``). The config below mirrors that definition 1:1.
VOLT_VARIANTS = {
    "volt-s": dict(dim=384, num_heads=6),
    "volt-convattn": dict(dim=384, num_heads=6, conv_before_attn=True),
    "volt-b": dict(dim=768, num_heads=12),
    "volt-convblock": dict(dim=384, num_heads=6, tokenizer_type="convblock"),
    "volt-all3": dict(
        dim=768, num_heads=12, tokenizer_type="convblock",
        conv_before_attn=True,
    ),
    "volt-blockattn": dict(
        dim=384, num_heads=6, tokenizer_type="convblock",
        conv_before_attn=True,
    ),
    "volt-b-convblock": dict(
        dim=768, num_heads=12, tokenizer_type="convblock"
    ),
}


def build_volt(
    variant: str = "volt-s",
    in_channels: int = 3,
    out_channels: int = 20,
    **overrides,
) -> Volt:
    """Build a Volt variant by name (reference ``build_volt``)."""
    cfg = dict(VOLT_VARIANTS[variant])
    cfg.update(overrides)
    return Volt(in_channels=in_channels, out_channels=out_channels, **cfg)
