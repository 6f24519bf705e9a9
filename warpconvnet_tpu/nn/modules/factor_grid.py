"""FactorGrid module suite (reference ``nn/modules/factor_grid.py:49-647``:
transform / cat / pool / intra-communication / to-point / point-to /
projection / global-conv) — the FIGConvNet building blocks.

A factorized grid stores a 3D field as K anisotropic grids (e.g.
[X,Y,4], [X,4,Z], [4,Y,Z]) whose small axis is folded into channels
(``b_zc_x_y``-style memory formats). Convolutions then run as dense **2D**
convs over the two long axes — ideal MXU work — and the grids exchange
information by trilinear sampling at each other's cell centers
("intra-communication").
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.grid import (
    FACTORIZED_FORMATS,
    FactorGrid,
    Grid,
)
from warpconvnet_tpu.geometry.conversions import (
    grid_sample_points,
    points_to_factor_grid,
)
from warpconvnet_tpu.geometry.points import Points


class FactorGridConv(nn.Module):
    """Per-grid 2D conv over the uncompressed axes, compressed axis folded
    into channels (reference GridConv in compressed formats + projection)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        out = []
        for gi, g in enumerate(grids):
            fmt = g.memory_format
            assert fmt in FACTORIZED_FORMATS, f"expected factorized grid, got {fmt}"
            comp_ax = FACTORIZED_FORMATS[fmt]
            comp = g.grid_shape[comp_ax]
            # [B, comp*C, A1, A2] -> channel-last [B, A1, A2, comp*C]
            f = jnp.moveaxis(g.features, 1, -1)
            f = nn.Conv(
                self.out_channels * comp,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="SAME",
                name=f"conv{gi}",
            )(f)
            f = jnp.moveaxis(f, -1, 1)
            if self.stride == 1:
                new_shape = g.grid_shape
            else:
                new_shape = tuple(
                    s if ax == comp_ax else max(s // self.stride, 1)
                    for ax, s in enumerate(g.grid_shape)
                )
            out.append(
                Grid(
                    features=f,
                    bounds=g.bounds,
                    grid_shape=new_shape,
                    num_channels=self.out_channels,
                    memory_format=fmt,
                )
            )
        return FactorGrid(out)


class FactorGridTransform(nn.Module):
    """Apply an elementwise feature transform to every grid (reference
    FactorGridTransform)."""

    transform: Callable[[jnp.ndarray], jnp.ndarray]

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        return FactorGrid(
            g.replace_features(self.transform(g.features)) for g in grids
        )


def factor_grid_cat(a: FactorGrid, b: FactorGrid) -> FactorGrid:
    """Channel-concat two factor grids of identical shapes (reference
    FactorGridCat)."""
    out = []
    for ga, gb in zip(a, b):
        assert ga.grid_shape == gb.grid_shape and ga.memory_format == gb.memory_format
        canon = jnp.concatenate(
            [ga.canonical_features(), gb.canonical_features()], axis=-1
        )
        out.append(
            Grid(
                features=canon,
                bounds=ga.bounds,
                grid_shape=ga.grid_shape,
                num_channels=ga.num_channels + gb.num_channels,
                memory_format="b_x_y_z_c",
            ).to_memory_format(ga.memory_format)
        )
    return FactorGrid(out)


class FactorGridPool(nn.Module):
    """Downsample the long axes of every grid 2x (strided conv), reference
    FactorGridPool."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        return FactorGridConv(
            self.in_channels, self.out_channels, kernel_size=2, stride=2,
            name="pool",
        )(grids)


class FactorGridIntraCommunication(nn.Module):
    """Each grid receives the other grids' fields sampled at its own cell
    centers (sum-fused), reference FactorGridIntraCommunications."""

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        if len(grids) == 1:
            return grids
        out = []
        for i, g in enumerate(grids):
            centers = g.coordinates()  # [B, X, Y, Z, 3]
            b = centers.shape[0]
            flat = centers.reshape(b, -1, 3)
            acc = g.canonical_features()
            nq = flat.shape[1]
            qpts = Points.create(
                flat, jnp.zeros((b, nq, 1)), jnp.full((b,), nq, jnp.int32)
            )
            for j, other in enumerate(grids):
                if i == j:
                    continue
                sampled = grid_sample_points(other, qpts)
                acc = acc + sampled.reshape(acc.shape)
            out.append(
                Grid(
                    features=acc,
                    bounds=g.bounds,
                    grid_shape=g.grid_shape,
                    num_channels=g.num_channels,
                    memory_format="b_x_y_z_c",
                ).to_memory_format(g.memory_format)
            )
        return FactorGrid(out)


class PointToFactorGrid(nn.Module):
    """Project point features into a fresh FactorGrid (reference
    PointToFactorGrid)."""

    grid_shapes: Tuple[Tuple[int, int, int], ...]
    reduction: str = "mean"

    @nn.compact
    def __call__(self, points: Points, bounds=None) -> FactorGrid:
        return points_to_factor_grid(
            points, self.grid_shapes, bounds=bounds, reduction=self.reduction
        )


class FactorGridToPoint(nn.Module):
    """Sample every grid at the point positions, concat (+ optional self
    features), project (reference FactorGridToPoint)."""

    grid_channels: int
    out_channels: int
    use_point_features: bool = True

    @nn.compact
    def __call__(self, grids: FactorGrid, points: Points) -> Points:
        parts = [grid_sample_points(g, points) for g in grids]
        if self.use_point_features:
            parts.append(points.features)
        x = jnp.concatenate(parts, axis=-1)
        x = nn.Dense(self.out_channels)(x)
        x = jnp.where(points.valid_mask()[..., None], x, 0)
        return points.replace_features(x)


class FactorGridGlobalConv(nn.Module):
    """Global context: per-grid global average -> MLP -> broadcast-add
    (reference FactorGridGlobalConv)."""

    channels: int

    @nn.compact
    def __call__(self, grids: FactorGrid) -> FactorGrid:
        out = []
        for gi, g in enumerate(grids):
            canon = g.canonical_features()
            pooled = canon.mean(axis=(1, 2, 3))  # [B, C]
            ctx = nn.Dense(self.channels, name=f"ctx{gi}")(pooled)
            canon = canon + jax.nn.gelu(ctx)[:, None, None, None, :]
            out.append(
                Grid(
                    features=canon,
                    bounds=g.bounds,
                    grid_shape=g.grid_shape,
                    num_channels=g.num_channels,
                    memory_format="b_x_y_z_c",
                ).to_memory_format(g.memory_format)
            )
        return FactorGrid(out)
