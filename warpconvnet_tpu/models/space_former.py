"""SpaCeFormer — mixed SPace (window) / CurvE (serialized) attention
encoder-decoder for sparse voxel segmentation.

Reference: ``warpconvnet/models/space_former.py`` (``SpaCeFormer:80``) and the
segmentation variant ``space_former_seg.py``. The reference alternates window
attention (``SpaceAttention``) with serialized curve attention inside each
stage, downsampling by strided sparse conv and upsampling by transposed conv
with skip concatenation.

TPU notes: per-level capacities are rounded to the window-attention tile so
the banded-tile scheme stays shape-static; blocks alternate
space / shifted-space / curve within each stage.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.space_attention import SpaCeFormerBlock, _round_up
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d
from warpconvnet_tpu.nn.modules.norms import BatchNorm


class _Stage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    patch_size: int
    rope_base: Optional[float]
    tile: int

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        # Alternate: space, shifted-space, curve, space, ...
        for i in range(self.depth):
            mode = "curve" if i % 3 == 2 else "space"
            x = SpaCeFormerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mode=mode,
                window_size=self.window_size,
                patch_size=self.patch_size,
                shift=(i % 3 == 1),
                order=("xyz", "zyx", "yxz")[i % 3],
                rope_base=self.rope_base,
                tile=self.tile,
                name=f"block{i}",
            )(x)
        return x


class SpaCeFormer(nn.Module):
    """Encoder-decoder SpaCeFormer (reference ``SpaCeFormer:80`` /
    ``space_former_seg.py`` semantic-seg variant)."""

    in_channels: int
    out_channels: int
    dims: Tuple[int, ...] = (64, 128, 256, 512)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    dec_depths: Tuple[int, ...] = (2, 2, 2)
    window_size: int = 4
    patch_size: int = 512
    rope_base: Optional[float] = 100.0
    tile: int = 128
    capacities: Optional[Tuple[int, ...]] = None

    def _caps(self, n: int) -> Tuple[int, ...]:
        if self.capacities is not None:
            return self.capacities
        lvl = len(self.dims)
        return tuple(
            _round_up(max(n // (2 ** i), self.tile), self.tile) for i in range(lvl)
        )

    @nn.compact
    def __call__(self, x: Voxels, train: bool = True) -> Voxels:
        n_levels = len(self.dims)
        caps = self._caps(x.max_num_points)

        # Patch-embed stem: submanifold conv.
        h, _ = SparseConv3d(self.in_channels, self.dims[0], 3, name="stem")(x)
        h = h.replace_features(nn.LayerNorm()(h.features))

        skips, tables = [], []
        for lvl in range(n_levels):
            if lvl > 0:
                h, t = SparseConv3d(
                    self.dims[lvl - 1],
                    self.dims[lvl],
                    2,
                    stride=2,
                    out_capacity=caps[lvl],
                    name=f"down{lvl}",
                )(h)
                tables.append(t)
                h = h.replace_features(nn.LayerNorm()(h.features))
            h = _Stage(
                dim=self.dims[lvl],
                depth=self.depths[lvl],
                num_heads=self.num_heads[lvl],
                window_size=self.window_size,
                patch_size=min(self.patch_size, caps[lvl]),
                rope_base=self.rope_base,
                tile=self.tile,
                name=f"enc{lvl}",
            )(h)
            if lvl < n_levels - 1:
                skips.append(h)

        for s in range(n_levels - 1):
            lvl = n_levels - 2 - s
            skip = skips[lvl]
            h, _ = SparseConv3d(
                h.num_channels,
                self.dims[lvl],
                2,
                stride=2,
                transposed=True,
                name=f"up{lvl}",
            )(h, out_coords=skip, pair_table=tables[lvl].reversed())
            h = h.replace_features(
                nn.LayerNorm()(
                    jnp.concatenate([h.features, skip.features], axis=-1)
                )
            )
            h, _ = SparseConv3d(
                self.dims[lvl] * 2, self.dims[lvl], 1, name=f"fuse{lvl}"
            )(h)
            h = _Stage(
                dim=self.dims[lvl],
                depth=self.dec_depths[lvl] if lvl < len(self.dec_depths) else 2,
                num_heads=self.num_heads[lvl],
                window_size=self.window_size,
                patch_size=min(self.patch_size, caps[lvl]),
                rope_base=self.rope_base,
                tile=self.tile,
                name=f"dec{lvl}",
            )(h)

        out, _ = SparseConv3d(
            self.dims[0], self.out_channels, 1, use_bias=True, name="head"
        )(h)
        return out


class SpaCeFormerInstanceSeg(nn.Module):
    """Open-vocabulary instance-segmentation variant (reference
    ``space_former_seg.py`` instance model): the SpaCeFormer backbone emits
    per-voxel features; learned queries cross-attend over them to produce
    instance masks + an open-vocab embedding per query (dot it against text
    embeddings instead of a fixed classifier)."""

    in_channels: int
    embed_dim: int = 256  # open-vocab embedding size (e.g. CLIP text dim)
    num_queries: int = 64
    dims: Tuple[int, ...] = (64, 128, 256)
    depths: Tuple[int, ...] = (2, 2, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16)
    dec_depths: Tuple[int, ...] = (1, 1)
    window_size: int = 4
    tile: int = 128

    @nn.compact
    def __call__(self, x: Voxels, train: bool = True):
        from warpconvnet_tpu.nn.functional.attention import masked_sdpa

        backbone = SpaCeFormer(
            in_channels=self.in_channels,
            out_channels=self.dims[0],
            dims=self.dims,
            depths=self.depths,
            num_heads=self.num_heads,
            dec_depths=self.dec_depths,
            window_size=self.window_size,
            tile=self.tile,
            name="backbone",
        )
        feats_vox = backbone(x, train=train)
        feats = feats_vox.features
        valid = feats_vox.valid_mask()
        b, n, c = feats.shape

        queries = self.param(
            "queries", nn.initializers.normal(0.02), (self.num_queries, c)
        )
        q = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        h = 4
        d = c // h
        for i in range(2):
            qn = nn.LayerNorm()(q)
            qh = nn.Dense(c, name=f"q{i}")(qn).reshape(b, -1, h, d)
            kv = nn.Dense(2 * c, name=f"kv{i}")(feats)
            k, v = jnp.split(kv, 2, -1)
            ca = masked_sdpa(
                qh, k.reshape(b, n, h, d), v.reshape(b, n, h, d), None, valid
            ).reshape(b, -1, c)
            q = q + nn.Dense(c, name=f"proj{i}")(ca)
            q = q + nn.Dense(c, name=f"ffn{i}")(jax.nn.gelu(nn.LayerNorm()(q)))

        q = nn.LayerNorm()(q)
        mask_embed = nn.Dense(c, name="mask_embed")(q)
        mask_logits = jnp.einsum("bqc,bnc->bqn", mask_embed, feats)
        mask_logits = jnp.where(valid[:, None, :], mask_logits, -1e30)
        ov_embed = nn.Dense(self.embed_dim, name="ov_embed")(q)
        ov_embed = ov_embed / jnp.maximum(
            jnp.linalg.norm(ov_embed, axis=-1, keepdims=True), 1e-8
        )
        return mask_logits, ov_embed
