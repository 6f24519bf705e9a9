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
