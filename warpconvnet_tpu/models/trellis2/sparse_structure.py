"""TRELLIS.2 sparse-structure stage (reference
``warpconvnet/models/trellis2/``: ``ss_flow`` dense DiT +
``SparseStructureDecoder`` — the low-resolution occupancy latent).

The sparse-structure latent is a dense low-res grid (e.g. 16^3) whose flow
model is a standard DiT over flattened grid tokens; the decoder upsamples to
the occupancy grid whose active cells seed the sparse stages.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.nn.functional.attention import masked_sdpa
from warpconvnet_tpu.nn.functional.pixel_shuffle import pixel_shuffle_3d
from warpconvnet_tpu.nn.modules.embeddings import TimestepEmbedder


class _DiTBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, cond, context=None):
        b, s, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        mod = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros,
                       name="adaLN")(jax.nn.silu(cond))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        def modulate(v, sh, sc):
            return v * (1 + sc[:, None]) + sh[:, None]

        y = modulate(nn.LayerNorm(use_bias=False, use_scale=False)(x), sh1, sc1)
        qkv = nn.Dense(3 * self.dim, name="qkv")(y)
        q, k, v = (t.reshape(b, s, h, d) for t in jnp.split(qkv, 3, -1))
        att = masked_sdpa(q, k, v).reshape(b, s, self.dim)
        x = x + g1[:, None] * nn.Dense(self.dim, name="proj")(att)

        if context is not None:
            y = nn.LayerNorm()(x)
            qh = nn.Dense(self.dim, name="ca_q")(y).reshape(b, s, h, d)
            kv = nn.Dense(2 * self.dim, name="ca_kv")(context)
            kk, vv = jnp.split(kv, 2, -1)
            t_ = context.shape[1]
            ca = masked_sdpa(
                qh, kk.reshape(b, t_, h, d), vv.reshape(b, t_, h, d)
            ).reshape(b, s, self.dim)
            x = x + nn.Dense(self.dim, name="ca_proj")(ca)

        y = modulate(nn.LayerNorm(use_bias=False, use_scale=False)(x), sh2, sc2)
        y = nn.Dense(4 * self.dim)(y)
        y = jax.nn.gelu(y)
        x = x + g2[:, None] * nn.Dense(self.dim)(y)
        return x


class SparseStructureFlowModel(nn.Module):
    """Dense DiT over the [B, R, R, R, C] structure latent (reference
    ss_flow). Predicts the flow velocity field."""

    resolution: int = 16
    in_channels: int = 8
    dim: int = 256
    depth: int = 8
    num_heads: int = 8

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b = x.shape[0]
        r = self.resolution
        assert x.shape == (b, r, r, r, self.in_channels), x.shape
        tokens = x.reshape(b, r * r * r, self.in_channels)
        htok = nn.Dense(self.dim, name="embed")(tokens)
        # Learned 3D positional embedding.
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (r * r * r, self.dim)
        )
        htok = htok + pos[None]
        cond = TimestepEmbedder(self.dim, name="t_embed")(t)
        for i in range(self.depth):
            htok = _DiTBlock(self.dim, self.num_heads, name=f"block{i}")(
                htok, cond, context
            )
        htok = nn.LayerNorm()(htok)
        out = nn.Dense(self.in_channels, kernel_init=nn.initializers.zeros,
                       name="out")(htok)
        return out.reshape(b, r, r, r, self.in_channels)


class SparseStructureEncoder(nn.Module):
    """Occupancy grid -> structure latent (dense conv encoder, reference
    ss VAE encoder)."""

    latent_channels: int = 8
    channels: Tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, occ: jnp.ndarray) -> jnp.ndarray:
        x = occ
        for i, c in enumerate(self.channels):
            x = nn.Conv(c, (3, 3, 3), strides=(2, 2, 2), name=f"down{i}")(x)
            x = jax.nn.silu(nn.GroupNorm(num_groups=8)(x))
        return nn.Conv(self.latent_channels, (3, 3, 3), name="out")(x)


class SparseStructureDecoder(nn.Module):
    """Structure latent -> occupancy logits at 2^len(channels) x resolution
    (reference SparseStructureDecoder: upsampling conv stack)."""

    channels: Tuple[int, ...] = (128, 64, 32)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = z
        for i, c in enumerate(self.channels):
            x = nn.Conv(c * 8, (3, 3, 3), name=f"conv{i}")(x)
            # channel -> space upsample (pixel shuffle 3D operates channel-first)
            x = jnp.moveaxis(pixel_shuffle_3d(jnp.moveaxis(x, -1, 1), 2), 1, -1)
            x = jax.nn.silu(nn.GroupNorm(num_groups=8)(x))
        return nn.Conv(1, (3, 3, 3), name="occ")(x)
