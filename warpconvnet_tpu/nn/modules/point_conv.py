"""Continuous point convolution (reference ``nn/modules/point_conv.py:36``):
neighbor search -> edge features [neighbor ‖ self ‖ rel-pos(-encoding)] ->
edge MLP -> masked multi-reduction over neighbors -> out MLP.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional.encodings import sinusoidal_encoding
from warpconvnet_tpu.nn.modules.mlp import MLPBlock
from warpconvnet_tpu.ops.search import RealSearchConfig, neighbor_search


class PointConv(nn.Module):
    in_channels: int
    out_channels: int
    search: RealSearchConfig = RealSearchConfig("knn", knn_k=16)
    reductions: Sequence[str] = ("mean",)
    edge_hidden: Optional[int] = None
    use_rel_pos: bool = True
    use_rel_pos_encode: bool = False
    pos_encode_channels: int = 32
    pos_encode_range: float = 4.0
    downsample_voxel_size: Optional[float] = None
    out_capacity: Optional[int] = None

    @nn.compact
    def __call__(
        self, in_pc: Points, out_pc: Optional[Points] = None
    ) -> Points:
        if out_pc is None:
            if self.downsample_voxel_size is not None:
                out_pc = in_pc.voxel_downsample(
                    self.downsample_voxel_size, max_out=self.out_capacity
                )
            else:
                out_pc = in_pc

        res = neighbor_search(
            out_pc.coords, in_pc.coords, out_pc.num_valid, in_pc.num_valid, self.search
        )
        # Gather neighbor features/coords: [B, M, k, C] / [B, M, k, 3].
        nb_feats = jax.vmap(lambda f, i: f[i])(in_pc.features, res.indices)
        nb_coords = jax.vmap(lambda c, i: c[i])(in_pc.coords, res.indices)
        self_feats = jnp.broadcast_to(
            out_pc.features[:, :, None, :], nb_feats.shape[:3] + (out_pc.num_channels,)
        )
        parts = [nb_feats, self_feats]
        if self.use_rel_pos or self.use_rel_pos_encode:
            rel = nb_coords - out_pc.coords[:, :, None, :]
            if self.use_rel_pos_encode:
                parts.append(
                    sinusoidal_encoding(rel, self.pos_encode_channels, self.pos_encode_range)
                )
            else:
                parts.append(rel.astype(nb_feats.dtype))
        edge = jnp.concatenate(parts, axis=-1)

        hidden = self.edge_hidden or self.out_channels
        edge = MLPBlock(hidden, self.out_channels, name="edge_mlp")(edge)

        mask = res.mask[..., None]
        reduced = []
        for red in self.reductions:
            if red == "mean":
                s = jnp.sum(jnp.where(mask, edge, 0), axis=2)
                d = jnp.maximum(jnp.sum(mask, axis=2), 1).astype(edge.dtype)
                reduced.append(s / d)
            elif red == "max":
                mx = jnp.max(jnp.where(mask, edge, -jnp.inf), axis=2)
                reduced.append(jnp.where(jnp.isfinite(mx), mx, 0))
            elif red == "sum":
                reduced.append(jnp.sum(jnp.where(mask, edge, 0), axis=2))
            else:
                raise ValueError(f"unsupported reduction {red!r}")
        out = jnp.concatenate(reduced, axis=-1)
        out = MLPBlock(self.out_channels, self.out_channels, name="out_mlp")(out)
        out = jnp.where(out_pc.valid_mask()[..., None], out, 0)
        return out_pc.replace(features=out)
