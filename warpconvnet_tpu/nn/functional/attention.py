"""Attention primitives over padded batches (reference
``nn/modules/attention.py:33-583``, ``nn/functional/flash_attn_utils.py``).

In the batched-padded layout, the reference's cat<->pad conversion and varlen
flash machinery collapse: features are already [B, N, C]; validity is a row
mask. Masked SDPA compiles to fused MXU attention under XLA; a Pallas flash
kernel can swap in behind the same signature for long sequences.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    row_valid_q: Optional[jnp.ndarray] = None,
    row_valid_kv: Optional[jnp.ndarray] = None,
    pair_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with row-validity masking.

    q: [..., Sq, H, D]; k, v: [..., Skv, H, D]
    row_valid_q: [..., Sq] bool; row_valid_kv: [..., Skv] bool
    pair_mask: [..., Sq, Skv] bool (optional extra structure, e.g. windows)
    Returns [..., Sq, H, D]. Fully-masked query rows produce 0 (NaN guard —
    reference attention.py masked-softmax fallback).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    qf = jnp.swapaxes(q, -2, -3)  # [..., H, Sq, D]
    kf = jnp.swapaxes(k, -2, -3)
    vf = jnp.swapaxes(v, -2, -3)
    logits = jnp.einsum(
        "...hqd,...hkd->...hqk", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    mask = None
    if row_valid_kv is not None:
        mask = row_valid_kv[..., None, None, :]
    if pair_mask is not None:
        pm = pair_mask[..., None, :, :]
        mask = pm if mask is None else (mask & pm)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        # Fully-masked rows: softmax of all -1e30 is uniform garbage; zero it.
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        probs = jnp.where(any_valid, probs, 0)
    out = jnp.einsum("...hqk,...hkd->...hqd", probs.astype(v.dtype), vf)
    out = jnp.swapaxes(out, -2, -3)
    if row_valid_q is not None:
        out = jnp.where(row_valid_q[..., None, None], out, 0)
    return out


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate pairs (even, odd) of the last dim by per-position phases.

    x: [..., D]; cos/sin: [..., D/2].
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1)
    return out.reshape(x.shape)


def rope_3d_phases(
    coords: jnp.ndarray, head_dim: int, base: float = 100.0, dtype=jnp.float32
):
    """3D coordinate-phase RoPE (reference ``nn/modules/rope.py:14-198``,
    ``fused_rope.qkv``): the head dim is split into 3 axis groups; each group
    gets rotary phases proportional to that coordinate.

    coords: [..., 3] (world or voxel coords). Returns (cos, sin) [..., D/2].
    """
    assert head_dim % 2 == 0
    half = head_dim // 2
    per_axis = half // 3
    rem = half - 3 * per_axis
    parts = []
    for ax in range(3):
        n = per_axis + (1 if ax < rem else 0)
        if n == 0:
            continue
        freqs = 1.0 / (base ** (jnp.arange(n, dtype=dtype) / max(n, 1)))
        parts.append(coords[..., ax:ax + 1].astype(dtype) * freqs)
    ang = jnp.concatenate(parts, axis=-1)  # [..., D/2]
    return jnp.cos(ang), jnp.sin(ang)
