"""Geometry conversions (reference ``geometry/types/conversion/*``):
points/voxels -> grid scatter, grid -> points trilinear sampling,
points -> factor grid."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.grid import FactorGrid, Grid
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels


def points_to_grid(
    points: Points,
    grid_shape: Sequence[int],
    bounds: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    memory_format: str = "b_x_y_z_c",
) -> Grid:
    """Scatter-reduce point features into a dense grid (reference
    ``points_to_grid``, conversion/to_grid.py — the voxel-mode path; the
    radius/knn modes are served by :func:`grid_sample_points`)."""
    b, n, c = points.features.shape
    gx, gy, gz = (int(s) for s in grid_shape)
    if bounds is None:
        mask = points.valid_mask()[..., None]
        big = jnp.asarray(1e30, points.coords.dtype)
        mn = jnp.min(jnp.where(mask, points.coords, big), axis=1)
        mx = jnp.max(jnp.where(mask, points.coords, -big), axis=1)
        bounds = jnp.stack([mn, mx + 1e-5], axis=1)
    origin = bounds[:, 0]
    extent = bounds[:, 1] - bounds[:, 0]
    cell = extent / jnp.asarray([gx, gy, gz], extent.dtype)
    ijk = jnp.floor((points.coords - origin[:, None, :]) / cell[:, None, :]).astype(jnp.int32)
    inside = (
        points.valid_mask()
        & (ijk >= 0).all(-1)
        & (ijk < jnp.asarray([gx, gy, gz], jnp.int32)).all(-1)
    )
    flat = (ijk[..., 0] * gy + ijk[..., 1]) * gz + ijk[..., 2]
    ncells = gx * gy * gz
    flat = jnp.where(inside, flat, ncells)

    def one(fl, fe, ins):
        fe = jnp.where(ins[:, None], fe, 0)
        acc = jnp.zeros((ncells + 1, c), fe.dtype).at[fl].add(fe, mode="drop")
        cnt = jnp.zeros((ncells + 1,), jnp.int32).at[fl].add(
            ins.astype(jnp.int32), mode="drop"
        )
        return acc[:ncells], cnt[:ncells]

    acc, cnt = jax.vmap(one)(flat, points.features, inside)
    if reduction == "mean":
        acc = acc / jnp.maximum(cnt, 1)[..., None].astype(acc.dtype)
    elif reduction != "sum":
        raise ValueError(f"unsupported reduction {reduction!r}")
    canon = acc.reshape(b, gx, gy, gz, c)
    g = Grid(
        features=canon, bounds=bounds, grid_shape=(gx, gy, gz),
        num_channels=c, memory_format="b_x_y_z_c",
    )
    return g.to_memory_format(memory_format)


def voxels_to_grid(
    voxels: Voxels,
    grid_shape: Sequence[int],
    min_coord: Optional[jnp.ndarray] = None,
    memory_format: str = "b_x_y_z_c",
) -> Grid:
    """Dense-ify sparse voxels into a Grid (reference ``voxels_to_grid``)."""
    gx, gy, gz = (int(s) for s in grid_shape)
    dense = voxels.to_dense((gx, gy, gz), min_coord=min_coord, channel_last=True)
    vs = jnp.asarray(
        [v * s for v, s in zip(voxels.voxel_size, voxels.tensor_stride)], jnp.float32
    )
    mn = (
        jnp.zeros((voxels.batch_size, 3), jnp.float32)
        if min_coord is None
        else jnp.broadcast_to(jnp.asarray(min_coord, jnp.float32), (voxels.batch_size, 3))
    ) * vs
    mx = mn + jnp.asarray([gx, gy, gz], jnp.float32) * vs
    bounds = jnp.stack([mn, mx], axis=1)
    g = Grid(
        features=dense, bounds=bounds, grid_shape=(gx, gy, gz),
        num_channels=voxels.num_channels, memory_format="b_x_y_z_c",
    )
    return g.to_memory_format(memory_format)


def grid_sample_points(grid: Grid, points: Points) -> jnp.ndarray:
    """Trilinear interpolation of grid features at point positions
    (reference FactorGridToPoint path). Returns [B, N, C]."""
    canon = grid.canonical_features()
    b, gx, gy, gz, c = canon.shape
    origin = grid.bounds[:, 0]
    cell = grid.cell_size()
    # Continuous cell coordinates relative to cell centers.
    u = (points.coords - origin[:, None, :]) / cell[:, None, :] - 0.5
    u = jnp.clip(u, 0.0, jnp.asarray([gx - 1, gy - 1, gz - 1], u.dtype) - 1e-6)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    gsz = jnp.asarray([gx, gy, gz], jnp.int32)
    i1 = jnp.minimum(i0 + 1, gsz - 1)

    def one(f, i0_, i1_, fr):
        def at(ii, jj, kk):
            return f[ii, jj, kk]

        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ii = jnp.where(dx, i1_[:, 0], i0_[:, 0])
                    jj = jnp.where(dy, i1_[:, 1], i0_[:, 1])
                    kk = jnp.where(dz, i1_[:, 2], i0_[:, 2])
                    w = (
                        jnp.where(dx, fr[:, 0], 1 - fr[:, 0])
                        * jnp.where(dy, fr[:, 1], 1 - fr[:, 1])
                        * jnp.where(dz, fr[:, 2], 1 - fr[:, 2])
                    )
                    out = out + at(ii, jj, kk) * w[:, None]
        return out

    return jax.vmap(one)(canon, i0, i1, frac)


def points_to_factor_grid(
    points: Points,
    grid_shapes: Sequence[Sequence[int]],
    bounds: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    memory_formats: Optional[Sequence[str]] = None,
) -> FactorGrid:
    """Project points into each factorized grid (reference
    ``points_to_factor_grid``, conversion/to_factor_grid.py)."""
    grids = []
    for i, gs in enumerate(grid_shapes):
        fmt = memory_formats[i] if memory_formats else None
        g = points_to_grid(points, gs, bounds, reduction, "b_x_y_z_c")
        if fmt is None:
            import numpy as _np

            ax = int(_np.argmin(gs))
            fmt = {0: "b_xc_y_z", 1: "b_yc_x_z", 2: "b_zc_x_y"}[ax]
        grids.append(g.to_memory_format(fmt))
    return FactorGrid(grids)
