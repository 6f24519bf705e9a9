"""TRELLIS.2 structured-latent flow model (reference
``models/trellis2/slat_flow.py``): a sparse DiT over Voxels latents with
timestep modulation and image-conditioning cross-attention, alternating
full / serialized attention."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.embeddings import TimestepEmbedder
from warpconvnet_tpu.nn.modules.sparse_dit import ModulatedSparseTransformerBlock


class SLatFlowModel(nn.Module):
    """Predicts the flow velocity on sparse latents (reference SLatFlow)."""

    in_channels: int = 8
    dim: int = 256
    depth: int = 8
    num_heads: int = 8
    window_size: int = 512
    rope_base: Optional[float] = 100.0
    cross_every: int = 2
    # share_mod (reference slat_flow.py:90,157-158): one adaLN head on the
    # timestep embedding serves every block (the published 4B config).
    share_mod: bool = False
    # pe_mode="ape" (reference slat_flow.py:103,163): absolute sinusoidal
    # position embedding of the voxel coords added to the token embedding.
    pe_mode: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: Voxels,
        t: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_valid: Optional[jnp.ndarray] = None,
    ) -> Voxels:
        h = x.replace_features(nn.Dense(self.dim, name="embed")(x.features))
        if self.pe_mode == "ape":
            from warpconvnet_tpu.nn.functional.encodings import (
                sinusoidal_encoding,
            )

            nch = max(2, (self.dim // 3) & ~1)  # even bands per axis
            pe = sinusoidal_encoding(
                x.coords.astype(jnp.float32), nch, data_range=1024.0
            ).reshape(x.coords.shape[0], x.coords.shape[1], -1)
            d = min(pe.shape[-1], self.dim)
            h = h.replace_features(
                h.features.at[..., :d].add(
                    jnp.where(x.valid_mask()[..., None], pe[..., :d], 0)
                )
            )
        cond = TimestepEmbedder(self.dim, name="t_embed")(t)
        if self.share_mod:
            cond = nn.Dense(
                6 * self.dim, name="adaLN_shared",
                kernel_init=nn.initializers.zeros,
            )(jax.nn.silu(cond))
        for i in range(self.depth):
            use_cross = context is not None and i % self.cross_every == 0
            h = ModulatedSparseTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mode="serialized" if i % 2 else "full",
                window_size=self.window_size,
                rope_base=self.rope_base,
                use_cross_attention=use_cross,
                shared_mod=self.share_mod,
                name=f"block{i}",
            )(h, cond, context if use_cross else None, context_valid)
        f = nn.LayerNorm()(h.features)
        out = nn.Dense(
            self.in_channels, kernel_init=nn.initializers.zeros, name="out"
        )(f)
        out = jnp.where(x.valid_mask()[..., None], out, 0)
        return x.replace(features=out)
