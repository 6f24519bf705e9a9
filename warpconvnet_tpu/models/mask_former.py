"""MaskFormer for 3D instance segmentation (reference
``warpconvnet/models/mask_former.py`` ``MaskFormer:284``): a sparse backbone
produces per-point features; a query decoder cross-attends learned queries
over the point features; mask logits = query x point feature dot products.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.mink_unet import MinkUNetBase
from warpconvnet_tpu.nn.functional.attention import masked_sdpa


class QueryDecoderLayer(nn.Module):
    """Cross-attention (queries -> points) + self-attention + FFN
    (reference mask_former.py query decoder)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(
        self, queries: jnp.ndarray, feats: jnp.ndarray, feat_valid: jnp.ndarray
    ) -> jnp.ndarray:
        b, q, _ = queries.shape
        h = self.num_heads
        d = self.dim // h

        # Cross-attention.
        x = nn.LayerNorm()(queries)
        qh = nn.Dense(self.dim, name="ca_q")(x).reshape(b, q, h, d)
        kv = nn.Dense(2 * self.dim, name="ca_kv")(feats)
        k, v = jnp.split(kv, 2, axis=-1)
        n = feats.shape[1]
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        ca = masked_sdpa(qh, k, v, None, feat_valid).reshape(b, q, self.dim)
        queries = queries + nn.Dense(self.dim, name="ca_proj")(ca)

        # Self-attention over queries.
        x = nn.LayerNorm()(queries)
        qkv = nn.Dense(3 * self.dim, name="sa_qkv")(x)
        qs, ks, vs = (t.reshape(b, q, h, d) for t in jnp.split(qkv, 3, axis=-1))
        sa = masked_sdpa(qs, ks, vs).reshape(b, q, self.dim)
        queries = queries + nn.Dense(self.dim, name="sa_proj")(sa)

        # FFN.
        x = nn.LayerNorm()(queries)
        y = nn.Dense(4 * self.dim)(x)
        y = jax.nn.gelu(y)
        queries = queries + nn.Dense(self.dim)(y)
        return queries


class MaskFormer(nn.Module):
    """Reference ``MaskFormer:284``. Returns (class_logits [B, Q, num_classes
    + 1], mask_logits [B, Q, N]) — +1 for the no-object class."""

    in_channels: int
    num_classes: int
    num_queries: int = 100
    dim: int = 128
    decoder_layers: int = 4
    backbone_planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)

    @nn.compact
    def __call__(self, vox: Voxels, train: bool = True):
        backbone = MinkUNetBase(
            self.in_channels,
            self.dim,
            planes=self.backbone_planes,
            layers=(2, 2, 2, 2, 2, 2, 2, 2),
            name="backbone",
        )
        feats_vox = backbone(vox, train=train)
        feats = feats_vox.features  # [B, N, dim]
        valid = feats_vox.valid_mask()

        b = feats.shape[0]
        queries = self.param(
            "queries",
            nn.initializers.normal(0.02),
            (self.num_queries, self.dim),
        )
        queries = jnp.broadcast_to(queries[None], (b,) + queries.shape)

        for i in range(self.decoder_layers):
            queries = QueryDecoderLayer(self.dim, name=f"dec{i}")(
                queries, feats, valid
            )

        queries = nn.LayerNorm()(queries)
        class_logits = nn.Dense(self.num_classes + 1, name="class_head")(queries)
        mask_embed = nn.Dense(self.dim, name="mask_embed")(queries)
        mask_logits = jnp.einsum("bqc,bnc->bqn", mask_embed, feats)
        mask_logits = jnp.where(valid[:, None, :], mask_logits, -1e30)
        return class_logits, mask_logits
