"""DINOv3-style ViT image conditioner (flax) — the real-architecture
replacement for the round-2 sinusoidal stub.

Mirrors the reference conditioner's structure
(``models/trellis2/image_cond.py:21-70`` ``DinoV3FeatureExtractor``:
patch-16 conv embed, cls + register tokens, 2D axial RoPE on q/k,
pre-norm transformer blocks, final LayerNorm over the hidden states) as a
native flax module so TRELLIS.2 conditioning is an actual ViT forward on
TPU instead of a random projection. Weights: randomly initialized by
default; :func:`warpconvnet_tpu.models.trellis2.weights.convert_dinov3_vit`
maps a torch DINOv3 checkpoint onto this parameter tree.

DINOv3-L/16 config: dim=1024, depth=24, heads=16, num_registers=4.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _axial_rope(q, k, hw: Tuple[int, int], num_prefix: int, base: float = 100.0):
    """2D axial RoPE on the patch tokens of q/k [B, H, S, Dh].

    The head dim splits in half: the first half rotates with the patch-row
    position, the second with the column. The ``num_prefix`` cls/register
    tokens are left unrotated (DINOv3 semantics)."""
    b, h, s, dh = q.shape
    gh, gw = hw
    dq = dh // 4  # frequencies per axis (pairs)
    freq = base ** (-jnp.arange(dq, dtype=jnp.float32) / dq)  # [dq]
    ys = jnp.repeat(jnp.arange(gh, dtype=jnp.float32), gw)  # [S_p]
    xs = jnp.tile(jnp.arange(gw, dtype=jnp.float32), gh)
    ang = jnp.concatenate(
        [ys[:, None] * freq[None, :], xs[:, None] * freq[None, :]], axis=1
    )  # [S_p, dh/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)

    def rot(x):
        xp = x[:, :, num_prefix:, :]
        x1, x2 = xp[..., 0::2], xp[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        rp = jnp.stack([r1, r2], axis=-1).reshape(xp.shape)
        return jnp.concatenate([x[:, :, :num_prefix, :], rp], axis=2)

    return rot(q), rot(k)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = 1e-5

    @nn.compact
    def __call__(self, x, hw, num_prefix):
        b, s, d = x.shape
        h = self.num_heads
        dh = d // h
        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q, k = _axial_rope(q, k, hw, num_prefix)
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh), axis=-1
        )
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        o = nn.Dense(d, name="proj")(o)
        if self.layerscale_init is not None:
            g1 = self.param(
                "ls1", nn.initializers.constant(self.layerscale_init), (d,)
            )
            o = o * g1
        x = x + o
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(d, name="fc2")(y)
        if self.layerscale_init is not None:
            g2 = self.param(
                "ls2", nn.initializers.constant(self.layerscale_init), (d,)
            )
            y = y * g2
        return x + y


class ViTConditioner(nn.Module):
    """DINOv3-shaped ViT: image [B, H, W, 3] -> tokens [B, S, dim]
    (cls + registers + patches, final LayerNorm applied — the reference
    returns ``F.layer_norm(hidden)`` the same way, image_cond.py:70)."""

    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    num_registers: int = 4
    layerscale_init: Optional[float] = 1e-5

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, hh, ww, _ = image.shape
        gh, gw = hh // p, ww // p
        x = nn.Conv(
            self.dim, (p, p), strides=(p, p), padding="VALID",
            name="patch_embed",
        )(image[:, : gh * p, : gw * p])
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        )
        reg = self.param(
            "register_tokens", nn.initializers.normal(0.02),
            (1, self.num_registers, self.dim),
        )
        num_prefix = 1 + self.num_registers
        x = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(reg, (b, 1, 1)), x], axis=1
        )
        for i in range(self.depth):
            x = _Block(
                self.dim, self.num_heads,
                layerscale_init=self.layerscale_init, name=f"block{i}",
            )(x, (gh, gw), num_prefix)
        # Reference: F.layer_norm over the last dim with no learned params.
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5)


def vit_conditioner_tiny(**kw) -> ViTConditioner:
    """Small config for tests / offline runs."""
    kw.setdefault("dim", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    return ViTConditioner(**kw)


def vit_conditioner_dinov3_l(**kw) -> ViTConditioner:
    """The reference's conditioner shape
    (facebook/dinov3-vitl16: D=1024, 24 blocks, 16 heads)."""
    return ViTConditioner(dim=1024, depth=24, num_heads=16, **kw)
