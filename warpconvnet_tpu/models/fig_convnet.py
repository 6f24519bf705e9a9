"""FIGConvNet — factorized implicit global convolution network (reference
``warpconvnet/models/fig_convnet.py`` ``FIGConvNet:31``; used for e.g.
DrivAerNet drag prediction).

Points -> factorized grids -> U-shaped 2D-conv processing with
intra-communication at each level -> sample back to points -> per-point head
(+ optional global scalar head for drag).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.grid import FactorGrid
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional.encodings import sinusoidal_encoding
from warpconvnet_tpu.nn.modules.factor_grid import (
    FactorGridConv,
    FactorGridGlobalConv,
    FactorGridIntraCommunication,
    FactorGridToPoint,
    factor_grid_cat,
    points_to_factor_grid,
)


class _Level(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        h = FactorGridConv(self.in_channels, self.out_channels, name="conv1")(grids)
        h = FactorGrid(g.replace_features(jax.nn.gelu(g.features)) for g in h)
        h = FactorGridIntraCommunication(name="comm")(h)
        h = FactorGridConv(self.out_channels, self.out_channels, name="conv2")(h)
        h = FactorGrid(g.replace_features(jax.nn.gelu(g.features)) for g in h)
        return h


class FIGConvNet(nn.Module):
    """Reference ``FIGConvNet:31``. Per-point outputs [B, N, out_channels];
    ``global_out_channels`` adds a pooled scalar head (drag prediction)."""

    in_channels: int
    out_channels: int
    hidden: int = 32
    grid_shapes: Tuple[Tuple[int, int, int], ...] = (
        (64, 64, 4), (64, 4, 64), (4, 64, 64),
    )
    levels: int = 2
    pos_encode_channels: int = 16
    global_out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, points: Points):
        # Point encoder: features + sin-encoded positions.
        enc = sinusoidal_encoding(
            points.coords, self.pos_encode_channels, 4.0
        )
        x = jnp.concatenate([points.features, enc], axis=-1)
        x = nn.Dense(self.hidden, name="point_enc")(x)
        x = jnp.where(points.valid_mask()[..., None], x, 0)
        pts = points.replace_features(x)

        grids = points_to_factor_grid(pts, self.grid_shapes, reduction="mean")

        # U over the long axes: down levels, bottom comm, up with skip concat.
        skips = []
        ch = self.hidden
        h = grids
        for lvl in range(self.levels):
            h = _Level(ch, self.hidden * (2 ** lvl), name=f"down{lvl}")(h)
            skips.append(h)
            ch = self.hidden * (2 ** lvl)
            h = FactorGridConv(ch, ch, kernel_size=2, stride=2, name=f"pool{lvl}")(h)

        h = FactorGridGlobalConv(ch, name="global")(h)
        h = _Level(ch, ch, name="bottom")(h)

        for lvl in reversed(range(self.levels)):
            skip = skips[lvl]
            # Upsample long axes back to the skip resolution by nearest
            # repeat, then 1x conv fuse.
            up = []
            for g, gs in zip(h, skip):
                canon = g.canonical_features()
                target = gs.grid_shape
                for ax in range(3):
                    rep = target[ax] // canon.shape[1 + ax]
                    if rep > 1:
                        canon = jnp.repeat(canon, rep, axis=1 + ax)
                up.append(
                    type(g)(
                        features=canon,
                        bounds=g.bounds,
                        grid_shape=target,
                        num_channels=g.num_channels,
                        memory_format="b_x_y_z_c",
                    ).to_memory_format(gs.memory_format)
                )
            h = factor_grid_cat(FactorGrid(up), skip)
            h = _Level(
                h[0].num_channels, skip[0].num_channels, name=f"up{lvl}"
            )(h)

        out_pts = FactorGridToPoint(
            grid_channels=h[0].num_channels,
            out_channels=self.hidden,
            name="to_point",
        )(h, pts)
        y = jax.nn.gelu(out_pts.features)
        per_point = nn.Dense(self.out_channels, name="head")(y)
        per_point = jnp.where(points.valid_mask()[..., None], per_point, 0)

        if self.global_out_channels is not None:
            denom = jnp.maximum(points.num_valid, 1).astype(y.dtype)[:, None]
            pooled = jnp.sum(
                jnp.where(points.valid_mask()[..., None], y, 0), axis=1
            ) / denom
            g_out = nn.Dense(self.global_out_channels, name="global_head")(
                jax.nn.gelu(nn.Dense(self.hidden, name="global_mlp")(pooled))
            )
            return per_point, g_out
        return per_point
