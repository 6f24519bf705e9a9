"""DGCNN — dynamic graph CNN classifier (reference
``warpconvnet/models/dgcnn.py:81``).

EdgeConv layers recompute a kNN graph in feature space each layer; edge
features are [x_i, x_j - x_i] -> shared MLP -> max over neighbors. On TPU the
kNN is the batched matmul-distance + top-k from :mod:`ops.search` — an MXU
workload — and the neighbor gather is a static-shape take_along_axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.ops.search import RealSearchConfig, neighbor_search


def knn_graph(feats: jnp.ndarray, num_valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, N, C] features -> [B, N, k] neighbor indices (valid rows only)."""
    cfg = RealSearchConfig("knn", knn_k=k)
    res = neighbor_search(feats, feats, num_valid, num_valid, cfg)
    return res.indices


class EdgeConv(nn.Module):
    out_channels: int
    k: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
        idx = knn_graph(x, num_valid, self.k)
        nb = jax.vmap(lambda f, i: f[i])(x, idx)  # [B, N, k, C]
        self_f = jnp.broadcast_to(x[:, :, None, :], nb.shape)
        edge = jnp.concatenate([self_f, nb - self_f], axis=-1)
        h = nn.Dense(self.out_channels)(edge)
        h = jax.nn.leaky_relu(nn.LayerNorm()(h), 0.2)
        out = jnp.max(h, axis=2)
        n = x.shape[1]
        mask = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], n), 1) < num_valid[:, None]
        return jnp.where(mask[..., None], out, 0)


class DGCNN(nn.Module):
    num_classes: int
    k: int = 20
    dims: Tuple[int, ...] = (64, 64, 128, 256)
    emb_dim: int = 1024
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pts: Points, train: bool = True) -> jnp.ndarray:
        x = jnp.concatenate([pts.coords, pts.features], axis=-1)
        nv = pts.num_valid
        feats = []
        for i, d in enumerate(self.dims):
            x = EdgeConv(d, self.k, name=f"edge{i}")(x, nv)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = jax.nn.leaky_relu(nn.LayerNorm()(nn.Dense(self.emb_dim)(x)), 0.2)
        mask = pts.valid_mask()[..., None]
        gmax = jnp.max(jnp.where(mask, x, -jnp.inf), axis=1)
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0)
        gmean = jnp.sum(jnp.where(mask, x, 0), axis=1) / jnp.maximum(
            nv, 1
        ).astype(x.dtype)[:, None]
        g = jnp.concatenate([gmax, gmean], axis=-1)
        g = jax.nn.leaky_relu(nn.Dense(512)(g), 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = jax.nn.leaky_relu(nn.Dense(256)(g), 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        return nn.Dense(self.num_classes)(g)
