"""Embedding modules (reference ``nn/modules/embeddings.py``: timestep /
sinusoidal / learned embeddings for diffusion-style models)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Standard DDPM sinusoidal timestep embedding. t: [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep -> MLP embedding (reference TimestepEmbedding)."""

    dim: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden or self.dim
        x = timestep_embedding(t, h)
        x = nn.Dense(h)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim)(x)
