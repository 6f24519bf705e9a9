"""Sparse DiT components (reference ``nn/modules/sparse_dit_attention.py``,
``sparse_dit.py``, ``dit.py``): ``SparseMultiHeadAttention`` (full or
window-serialized attention over Voxels), modulated (adaLN-zero) sparse
transformer blocks with optional cross-attention — the TRELLIS.2 building
blocks.

TPU formulation: full attention = masked SDPA over the padded batch;
"windowed serialized" attention = Morton-sort + fixed-size patches (the
PatchAttention machinery); modulation vectors come from
:class:`~warpconvnet_tpu.nn.modules.embeddings.TimestepEmbedder`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.flash_attention import (
    segment_attention,
    segment_ids_from_groups,
    segment_ids_from_valid,
)
from warpconvnet_tpu.nn.functional.attention import (
    apply_rope,
    masked_sdpa,
    rope_3d_phases,
)
from warpconvnet_tpu.nn.modules.attention import serialize_patches


class SparseMultiHeadAttention(nn.Module):
    """Self-attention over sparse voxels: mode 'full' or 'serialized'
    (window_size-length Morton patches), with optional 3D RoPE (reference
    ``SparseMultiHeadAttention``, sparse_dit_attention.py)."""

    dim: int
    num_heads: int = 8
    mode: str = "full"  # "full" | "serialized"
    window_size: int = 1024
    rope_base: Optional[float] = None
    qk_norm: bool = True

    @nn.compact
    def __call__(self, vox: Voxels) -> Voxels:
        x = vox.features
        b, n, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        if self.mode == "serialized":
            perm, inv = serialize_patches(vox.coords, vox.num_valid)
            qkv = jnp.take_along_axis(qkv, perm[..., None], axis=1)
            coords = jnp.take_along_axis(vox.coords, perm[..., None], axis=1)
        else:
            coords = vox.coords
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        if self.qk_norm:
            q = nn.RMSNorm(name="q_norm")(q)
            k = nn.RMSNorm(name="k_norm")(k)
        if self.rope_base is not None:
            cos, sin = rope_3d_phases(coords, d, self.rope_base, jnp.float32)
            cos, sin = cos[..., None, :], sin[..., None, :]
            q = apply_rope(q, cos, sin).astype(x.dtype)
            k = apply_rope(k, cos, sin).astype(x.dtype)

        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
            < vox.num_valid[:, None]
        )
        if self.mode == "serialized":
            # Fixed-size serialized windows = segment attention with the
            # patch index as segment id (reference windowed serialized
            # attention, flash-varlen semantics).
            p = self.window_size
            assert n % p == 0, (n, p)
            patch_id = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) // p
            seg = segment_ids_from_groups(patch_id, valid)
            out = segment_attention(q, k, v, seg).reshape(b, n, self.dim)
            out = jnp.where(valid[..., None], out, 0)
            out = jnp.take_along_axis(out, inv[..., None], axis=1)
        else:
            seg = segment_ids_from_valid(valid)
            out = segment_attention(q, k, v, seg).reshape(b, n, self.dim)
            out = jnp.where(valid[..., None], out, 0)
        out = nn.Dense(self.dim, name="proj")(out)
        out = jnp.where(vox.valid_mask()[..., None], out, 0)
        return vox.replace_features(out)


class SparseCrossAttention(nn.Module):
    """Cross-attention: voxel queries attend to conditioning tokens
    [B, S, C] (reference cross blocks in sparse_dit.py)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(
        self,
        vox: Voxels,
        context: jnp.ndarray,
        context_valid: Optional[jnp.ndarray] = None,
    ) -> Voxels:
        b, n, _ = vox.features.shape
        h = self.num_heads
        d = self.dim // h
        q = nn.Dense(self.dim, name="q")(vox.features).reshape(b, n, h, d)
        kv = nn.Dense(2 * self.dim, name="kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        s = context.shape[1]
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        ctx_valid = (
            context_valid
            if context_valid is not None
            else jnp.ones((b, s), bool)
        )
        out = segment_attention(
            q, k, v,
            segment_ids_from_valid(vox.valid_mask()),
            segment_ids_from_valid(ctx_valid),
        )
        out = nn.Dense(self.dim, name="proj")(out.reshape(b, n, self.dim))
        out = jnp.where(vox.valid_mask()[..., None], out, 0)
        return vox.replace_features(out)


def _modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class ModulatedSparseTransformerBlock(nn.Module):
    """adaLN-zero DiT block over Voxels, optional cross-attention (reference
    ``ModulatedSparseTransformerCrossBlock``, sparse_dit.py)."""

    dim: int
    num_heads: int = 8
    mode: str = "full"
    window_size: int = 1024
    rope_base: Optional[float] = None
    hidden_ratio: float = 4.0
    use_cross_attention: bool = False
    # share_mod (reference slat_flow.py share_mod): the 6 adaLN vectors are
    # computed ONCE from the timestep embedding by the parent model and
    # passed in as ``cond`` of width 6*dim — this block then has no adaLN
    # head of its own.
    shared_mod: bool = False

    @nn.compact
    def __call__(
        self,
        vox: Voxels,
        cond: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_valid: Optional[jnp.ndarray] = None,
    ) -> Voxels:
        x = vox.features
        # adaLN-zero: 6 modulation vectors from the conditioning embedding.
        if self.shared_mod:
            mod = cond
        else:
            mod = nn.Dense(
                6 * self.dim, name="adaLN", kernel_init=nn.initializers.zeros
            )(jax.nn.silu(cond))
        sa_shift, sa_scale, sa_gate, m_shift, m_scale, m_gate = jnp.split(
            mod, 6, axis=-1
        )

        hn = _modulate(nn.LayerNorm(use_bias=False, use_scale=False)(x),
                       sa_shift, sa_scale)
        attn_out = SparseMultiHeadAttention(
            self.dim, self.num_heads, self.mode, self.window_size,
            self.rope_base, name="attn",
        )(vox.replace_features(hn))
        x = x + sa_gate[:, None, :] * attn_out.features

        if self.use_cross_attention:
            assert context is not None
            ca = SparseCrossAttention(self.dim, self.num_heads, name="cross")(
                vox.replace_features(nn.LayerNorm()(x)), context, context_valid
            )
            x = x + ca.features

        hn = _modulate(nn.LayerNorm(use_bias=False, use_scale=False)(x),
                       m_shift, m_scale)
        hidden = int(self.dim * self.hidden_ratio)
        y = nn.Dense(hidden)(hn)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        x = x + m_gate[:, None, :] * y
        x = jnp.where(vox.valid_mask()[..., None], x, 0)
        return vox.replace(features=x)
