"""Normalization primitives over batched-padded geometry features.

The reference needs custom segmented CUDA kernels because its batches are
concatenated (``nn/functional/normalizations.py:24-290``); in the padded
[B, N, C] layout these are plain masked reductions — XLA fuses them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, gamma=None, beta=None, eps: float = 1e-5) -> jnp.ndarray:
    """Per-row layer norm over the channel dim."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def rms_norm(x: jnp.ndarray, gamma=None, eps: float = 1e-5) -> jnp.ndarray:
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    out = x * jax.lax.rsqrt(ms + eps)
    if gamma is not None:
        out = out * gamma
    return out


def masked_batch_stats(
    x: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/var over valid rows of [B, N, C] (mask [B, N])."""
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(jnp.sum(m), 1)
    mean = jnp.sum(x * m, axis=(0, 1)) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1)) / count
    return mean, var


def batch_norm(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    gamma=None,
    beta=None,
    eps: float = 1e-5,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked batch norm; pass (mean, var) for inference with running stats."""
    if mean is None or var is None:
        mean, var = masked_batch_stats(x, mask)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return jnp.where(mask[..., None], out, 0)


def segmented_range_norm(
    x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """(x - min) / (max - min + eps), per scene per channel over valid rows
    (reference ``SegmentedRangeNormFunction``)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    m = mask[..., None]
    mn = jnp.min(jnp.where(m, x, big), axis=1, keepdims=True)
    mx = jnp.max(jnp.where(m, x, -big), axis=1, keepdims=True)
    out = (x - mn) / (mx - mn + eps)
    return jnp.where(m, out, 0)


def segmented_layer_norm(
    x: jnp.ndarray, mask: jnp.ndarray, gamma=None, beta=None, eps: float = 1e-5
) -> jnp.ndarray:
    """Normalize with per-scene statistics over all valid rows and channels
    (reference ``SegmentedLayerNormFunction``)."""
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1)
    mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / count
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return jnp.where(mask[..., None], out, 0)


# --- segmented arithmetic (reference nn/functional/segmented_arithmetics.py) --
# With padded [B, N, C] features and per-scene vectors [B, C], these are plain
# broadcasts; kept as named functions for API parity.

def segmented_add(x, scene_vec):
    return x + scene_vec[:, None, :]


def segmented_subtract(x, scene_vec):
    return x - scene_vec[:, None, :]


def segmented_multiply(x, scene_vec):
    return x * scene_vec[:, None, :]


def segmented_divide(x, scene_vec):
    return x / scene_vec[:, None, :]
