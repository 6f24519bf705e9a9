"""PointNet classifier (reference ``warpconvnet/models/pointnet.py:72``).

Shared per-point MLP -> global max pool -> classifier head, on the padded
:class:`Points` batch (masked pooling replaces the reference's ragged global
pool).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional.sparse_pool import global_pool


class PointNet(nn.Module):
    num_classes: int
    dims: Tuple[int, ...] = (64, 64, 128, 1024)
    head_dims: Tuple[int, ...] = (512, 256)
    use_coords: bool = True
    dropout: float = 0.3

    @nn.compact
    def __call__(self, pts: Points, train: bool = True) -> jnp.ndarray:
        x = pts.features
        if self.use_coords:
            x = jnp.concatenate([pts.coords, x], axis=-1)
        mask = pts.valid_mask()[..., None]
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"mlp{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = jax.nn.relu(x)
        x = jnp.where(mask, x, -jnp.inf)
        g = jnp.max(x, axis=1)
        g = jnp.where(jnp.isfinite(g), g, 0)
        for i, d in enumerate(self.head_dims):
            g = jax.nn.relu(nn.Dense(d, name=f"head{i}")(g))
            g = nn.Dropout(self.dropout, deterministic=not train)(g)
        return nn.Dense(self.num_classes, name="logits")(g)


class PointNetSeg(nn.Module):
    """Segmentation variant: concat per-point features with the global code."""

    num_classes: int
    dims: Tuple[int, ...] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, pts: Points, train: bool = True) -> jnp.ndarray:
        x = jnp.concatenate([pts.coords, pts.features], axis=-1)
        feats = []
        for i, d in enumerate(self.dims):
            x = jax.nn.relu(nn.LayerNorm()(nn.Dense(d, name=f"mlp{i}")(x)))
            feats.append(x)
        g = global_pool(pts.replace_features(x), "max")  # [B, C]
        g = jnp.broadcast_to(g[:, None], x.shape)
        x = jnp.concatenate(feats + [g], axis=-1)
        x = jax.nn.relu(nn.Dense(256)(x))
        return nn.Dense(self.num_classes)(x)
