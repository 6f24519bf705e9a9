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


class _DenseResBlock3d(nn.Module):
    """norm-silu-conv x2 + skip (reference ``ResBlock3d`` in the SS VAE)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.channels, (3, 3, 3), name="conv1")(
            jax.nn.silu(nn.LayerNorm(name="norm1")(x))
        )
        h = nn.Conv(
            self.channels, (3, 3, 3),
            kernel_init=nn.initializers.zeros, name="conv2",
        )(jax.nn.silu(nn.LayerNorm(name="norm2")(h)))
        return x + h


class SparseStructureEncoder(nn.Module):
    """Occupancy grid -> Gaussian structure latent (reference
    ``SparseStructureEncoder``, sparse_structure_vae.py:63-142: input conv,
    per-stage res blocks + stride-2 downsample, middle res blocks,
    norm-silu-conv head emitting mean || logvar; inference returns mean)."""

    latent_channels: int = 8
    channels: Tuple[int, ...] = (32, 64, 128)
    num_res_blocks: int = 1
    num_res_blocks_middle: int = 2

    @nn.compact
    def __call__(self, occ: jnp.ndarray, sample_posterior: bool = False,
                 rng=None):
        x = nn.Conv(self.channels[0], (3, 3, 3), name="input")(occ)
        for i, c in enumerate(self.channels):
            for j in range(self.num_res_blocks):
                x = _DenseResBlock3d(c, name=f"res{i}_{j}")(x)
            if i < len(self.channels) - 1:
                x = nn.Conv(
                    self.channels[i + 1], (3, 3, 3), strides=(2, 2, 2),
                    name=f"down{i}",
                )(x)
        for j in range(self.num_res_blocks_middle):
            x = _DenseResBlock3d(self.channels[-1], name=f"mid{j}")(x)
        x = jax.nn.silu(nn.LayerNorm(name="out_norm")(x))
        out = nn.Conv(self.latent_channels * 2, (3, 3, 3), name="out")(x)
        mean, logvar = jnp.split(out, 2, axis=-1)
        if sample_posterior:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
            return mean + jnp.exp(0.5 * logvar) * eps, logvar
        return mean, logvar


class SparseStructureDecoder(nn.Module):
    """Structure latent -> occupancy logits at 2^(len(channels)-1) x
    resolution (reference ``SparseStructureDecoder``,
    sparse_structure_vae.py:144-223: input conv, middle res blocks,
    per-stage res blocks + pixel-shuffle upsample, norm-silu-conv head)."""

    channels: Tuple[int, ...] = (128, 64, 32)
    out_channels: int = 1
    num_res_blocks: int = 1
    num_res_blocks_middle: int = 2

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channels[0], (3, 3, 3), name="input")(z)
        for j in range(self.num_res_blocks_middle):
            x = _DenseResBlock3d(self.channels[0], name=f"mid{j}")(x)
        for i, c in enumerate(self.channels):
            for j in range(self.num_res_blocks):
                x = _DenseResBlock3d(c, name=f"res{i}_{j}")(x)
            if i < len(self.channels) - 1:
                nxt = self.channels[i + 1]
                x = nn.Conv(nxt * 8, (3, 3, 3), name=f"up{i}")(x)
                x = jnp.moveaxis(
                    pixel_shuffle_3d(jnp.moveaxis(x, -1, 1), 2), 1, -1
                )
        x = jax.nn.silu(nn.LayerNorm(name="out_norm")(x))
        return nn.Conv(self.out_channels, (3, 3, 3), name="occ")(x)
