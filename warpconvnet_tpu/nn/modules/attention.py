"""Attention modules (reference ``nn/modules/attention.py:33-583``):
``Attention`` (fused QKV via BatchedLinear), ``FeedForward``,
``TransformerBlock``, ``SpatialFeatureAttention`` (full attention over a
geometry's valid rows), and ``PatchAttention`` (Morton-serialized fixed-size
patch attention — the PTv3 workhorse, which the padded-batch layout makes a
pure reshape)."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.base import GeometryMixin
from warpconvnet_tpu.nn.functional.attention import (
    apply_rope,
    masked_sdpa,
    rope_3d_phases,
)
from warpconvnet_tpu.nn.functional.flash_attention import (
    segment_attention,
    segment_ids_from_groups,
    segment_ids_from_valid,
)
from warpconvnet_tpu.nn.functional.encodings import sinusoidal_encoding
from warpconvnet_tpu.nn.modules.mlp import BatchedLinear
from warpconvnet_tpu.ops.morton import MORTON_ORDERINGS, morton_argsort
from warpconvnet_tpu.ops.keys import PAD_COORD


class Attention(nn.Module):
    """Multi-head attention over [.., S, C] with row-validity masking.

    ``use_batched_qkv`` keeps Q/K/V as one [3, C, C] parameter (reference's
    Muon-friendly BatchedLinear layout).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    use_batched_qkv: bool = True
    rope_base: Optional[float] = None  # enable 3D RoPE when coords passed

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        row_valid: Optional[jnp.ndarray] = None,
        coords: Optional[jnp.ndarray] = None,
        pair_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = self.num_heads
        d = self.dim // h
        if self.use_batched_qkv:
            qkv = BatchedLinear(3, self.dim, name="qkv")(x)  # [..., 3, C]
            q, k, v = (qkv[..., i, :] for i in range(3))
        else:
            qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = x.shape[:-1] + (h, d)
        q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
        if self.rope_base is not None and coords is not None:
            cos, sin = rope_3d_phases(coords, d, self.rope_base, jnp.float32)
            cos, sin = cos[..., None, :], sin[..., None, :]
            q = apply_rope(q, cos, sin).astype(x.dtype)
            k = apply_rope(k, cos, sin).astype(x.dtype)
        if pair_mask is not None:
            # Arbitrary pair structure: score-matrix path.
            out = masked_sdpa(q, k, v, row_valid, row_valid, pair_mask)
        else:
            # Segment-mask path: O(S*block) memory via the Pallas flash
            # kernel on TPU (reference flash_attn_varlen semantics).
            if segment_ids is not None:
                seg = segment_ids_from_groups(segment_ids, row_valid)
            elif row_valid is not None:
                seg = segment_ids_from_valid(row_valid)
            else:
                seg = jnp.zeros(x.shape[:-1], jnp.int32)
            lead = x.shape[:-2]
            bs = int(np.prod(lead)) if lead else 1
            s = x.shape[-2]
            out = segment_attention(
                q.reshape(bs, s, h, d),
                k.reshape(bs, s, h, d),
                v.reshape(bs, s, h, d),
                seg.reshape(bs, s),
            ).reshape(q.shape)
            if row_valid is not None:
                out = jnp.where(row_valid[..., None, None], out, 0)
        out = out.reshape(x.shape[:-1] + (self.dim,))
        return nn.Dense(self.dim, name="proj")(out)


class FeedForward(nn.Module):
    dim: int
    hidden_ratio: float = 4.0
    act: Callable = jax.nn.gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.hidden_ratio)
        x = nn.Dense(hidden)(x)
        x = self.act(x)
        return nn.Dense(self.dim)(x)


class TransformerBlock(nn.Module):
    """Pre-norm attention + MLP block (reference ``TransformerBlock``)."""

    dim: int
    num_heads: int = 8
    hidden_ratio: float = 4.0
    rope_base: Optional[float] = None

    @nn.compact
    def __call__(self, x, row_valid=None, coords=None, pair_mask=None):
        a = Attention(self.dim, self.num_heads, rope_base=self.rope_base,
                      name="attn")(nn.LayerNorm()(x), row_valid, coords, pair_mask)
        x = x + a
        x = x + FeedForward(self.dim, self.hidden_ratio, name="mlp")(nn.LayerNorm()(x))
        if row_valid is not None:
            x = jnp.where(row_valid[..., None], x, 0)
        return x


class SpatialFeatureAttention(nn.Module):
    """Full attention across all valid points of each scene, with optional
    sinusoidal position encoding added to features (reference
    ``SpatialFeatureAttention``)."""

    dim: int
    num_heads: int = 8
    use_encoding: bool = False
    num_encoding_channels: int = 32
    encoding_range: float = 4.0

    @nn.compact
    def __call__(self, geometry: GeometryMixin) -> GeometryMixin:
        x = geometry.features
        if self.use_encoding:
            enc = sinusoidal_encoding(
                geometry.coords.astype(jnp.float32),
                self.num_encoding_channels,
                self.encoding_range,
            )
            x = x + nn.Dense(self.dim, name="pos_proj")(enc).astype(x.dtype)
        mask = geometry.valid_mask()
        out = Attention(self.dim, self.num_heads, name="attn")(x, mask)
        out = jnp.where(mask[..., None], out, 0)
        return geometry.replace_features(out)


def serialize_patches(
    coords: jnp.ndarray,
    num_valid: jnp.ndarray,
    ordering: str = "xyz",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-scene Morton permutation (+inverse) for patch grouping.

    coords: int [B, N, 3]. Valid rows sort to the front in Morton order;
    padded rows to the back. Returns (perm, inv_perm) [B, N] int32.
    """
    def one(c, nv):
        n = c.shape[0]
        valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        cmin = jnp.min(jnp.where(valid[:, None], c, PAD_COORD), axis=0)
        shifted = jnp.where(valid[:, None], c - cmin, PAD_COORD)
        return morton_argsort(shifted, valid, ordering)

    perm, inv = jax.vmap(one)(coords, num_valid)
    return perm, inv


class PatchAttention(nn.Module):
    """Serialized patch attention (reference ``PatchAttention``,
    attention.py:400-520; PTv3's core op): sort each scene by a Morton order,
    split into fixed ``patch_size`` groups, attend within groups.

    In the padded layout this is: permute rows -> reshape [B, N/P, P, C] ->
    masked SDPA -> inverse permute. Static shapes throughout.
    """

    dim: int
    patch_size: int = 1024
    num_heads: int = 8
    order: str = "xyz"
    rope_base: Optional[float] = None

    @nn.compact
    def __call__(self, geometry: GeometryMixin, order: Optional[str] = None):
        ordering = order or self.order
        x = geometry.features
        coords = geometry.coords
        b, n, c = x.shape
        p = self.patch_size
        assert n % p == 0, f"padded size {n} must be divisible by patch_size {p}"
        perm, inv = serialize_patches(coords, geometry.num_valid, ordering)

        xs = jnp.take_along_axis(x, perm[..., None], axis=1)
        cs = jnp.take_along_axis(coords, perm[..., None], axis=1)
        valid = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) < geometry.num_valid[:, None]

        xp = xs.reshape(b, n // p, p, c)
        cp = cs.reshape(b, n // p, p, 3)
        vp = valid.reshape(b, n // p, p)
        out = Attention(self.dim, self.num_heads, rope_base=self.rope_base,
                        name="attn")(xp, vp, cp if self.rope_base else None)
        out = out.reshape(b, n, c)
        out = jnp.take_along_axis(out, inv[..., None], axis=1)
        out = jnp.where(geometry.valid_mask()[..., None], out, 0)
        return geometry.replace_features(out)
