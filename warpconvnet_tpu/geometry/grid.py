"""Dense grid geometry with memory formats (reference
``geometry/types/grid.py``, ``geometry/features/grid.py:24-80``) and the
factorized grids used by FIGConvNet (``geometry/types/factor_grid.py``).

Memory formats (reference GridMemoryFormat):
  b_x_y_z_c   — [B, X, Y, Z, C]  (canonical; XLA/TPU-friendly channel-last)
  b_c_x_y_z   — [B, C, X, Y, Z]
  b_c_z_x_y   — [B, C, Z, X, Y]
  b_zc_x_y    — [B, Z*C, X, Y]   (z factorized into channels)
  b_xc_y_z    — [B, X*C, Y, Z]
  b_yc_x_z    — [B, Y*C, X, Z]

Coordinates are never materialized unless asked for (the reference's lazy
GridCoords, ``geometry/coords/grid.py:20-342``) — ``coordinates()`` computes
them from shape + bounds on demand.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.base import pytree_dataclass

GRID_MEMORY_FORMATS = (
    "b_x_y_z_c", "b_c_x_y_z", "b_c_z_x_y", "b_zc_x_y", "b_xc_y_z", "b_yc_x_z",
)

# Compressed (factorized) formats and their compressed spatial axis.
FACTORIZED_FORMATS = {"b_zc_x_y": 2, "b_xc_y_z": 0, "b_yc_x_z": 1}


def _to_canonical(features: jnp.ndarray, fmt: str, grid_shape, num_channels: int):
    x, y, z = grid_shape
    c = num_channels
    if fmt == "b_x_y_z_c":
        return features
    if fmt == "b_c_x_y_z":
        return jnp.transpose(features, (0, 2, 3, 4, 1))
    if fmt == "b_c_z_x_y":
        return jnp.transpose(features, (0, 3, 4, 2, 1))
    if fmt == "b_zc_x_y":
        f = features.reshape(features.shape[0], z, c, x, y)
        return jnp.transpose(f, (0, 3, 4, 1, 2))
    if fmt == "b_xc_y_z":
        f = features.reshape(features.shape[0], x, c, y, z)
        return jnp.transpose(f, (0, 1, 3, 4, 2))
    if fmt == "b_yc_x_z":
        f = features.reshape(features.shape[0], y, c, x, z)
        return jnp.transpose(f, (0, 3, 1, 4, 2))
    raise ValueError(f"unknown memory format {fmt}")


def _from_canonical(features: jnp.ndarray, fmt: str):
    b, x, y, z, c = features.shape
    if fmt == "b_x_y_z_c":
        return features
    if fmt == "b_c_x_y_z":
        return jnp.transpose(features, (0, 4, 1, 2, 3))
    if fmt == "b_c_z_x_y":
        return jnp.transpose(features, (0, 4, 3, 1, 2))
    if fmt == "b_zc_x_y":
        return jnp.transpose(features, (0, 3, 4, 1, 2)).reshape(b, z * c, x, y)
    if fmt == "b_xc_y_z":
        return jnp.transpose(features, (0, 1, 4, 2, 3)).reshape(b, x * c, y, z)
    if fmt == "b_yc_x_z":
        return jnp.transpose(features, (0, 2, 4, 1, 3)).reshape(b, y * c, x, z)
    raise ValueError(f"unknown memory format {fmt}")


@pytree_dataclass(meta_fields=("grid_shape", "memory_format", "num_channels"))
class Grid:
    """Dense regular grid geometry.

    features: array in ``memory_format`` layout.
    bounds: [B, 2, 3] world-space (min, max) corners (traced).
    """

    features: jnp.ndarray
    bounds: jnp.ndarray
    grid_shape: Tuple[int, int, int]
    num_channels: int
    memory_format: str = "b_x_y_z_c"

    @classmethod
    def from_shape(
        cls,
        grid_shape: Sequence[int],
        num_channels: int,
        batch_size: int = 1,
        bounds: Optional[jnp.ndarray] = None,
        memory_format: str = "b_x_y_z_c",
        dtype=jnp.float32,
    ) -> "Grid":
        gs = tuple(int(s) for s in grid_shape)
        canonical = jnp.zeros((batch_size,) + gs + (num_channels,), dtype)
        if bounds is None:
            bounds = jnp.tile(
                jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)[None],
                (batch_size, 1, 1),
            )
        return cls(
            features=_from_canonical(canonical, memory_format),
            bounds=bounds,
            grid_shape=gs,
            num_channels=num_channels,
            memory_format=memory_format,
        )

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    def canonical_features(self) -> jnp.ndarray:
        """[B, X, Y, Z, C] regardless of stored layout."""
        return _to_canonical(
            self.features, self.memory_format, self.grid_shape, self.num_channels
        )

    def to_memory_format(self, fmt: str) -> "Grid":
        if fmt == self.memory_format:
            return self
        canon = self.canonical_features()
        return dataclasses.replace(
            self, features=_from_canonical(canon, fmt), memory_format=fmt
        )

    def replace_features(self, features: jnp.ndarray, num_channels: Optional[int] = None):
        return dataclasses.replace(
            self, features=features,
            num_channels=num_channels or self.num_channels,
        )

    def cell_size(self) -> jnp.ndarray:
        """[B, 3] world size of one cell."""
        extent = self.bounds[:, 1] - self.bounds[:, 0]
        return extent / jnp.asarray(self.grid_shape, extent.dtype)

    def coordinates(self) -> jnp.ndarray:
        """Lazily materialize cell-center world coordinates [B, X, Y, Z, 3]."""
        gs = self.grid_shape
        ijk = jnp.stack(
            jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in gs], indexing="ij"),
            axis=-1,
        )  # [X, Y, Z, 3]
        cell = self.cell_size()  # [B, 3]
        origin = self.bounds[:, 0]  # [B, 3]
        return origin[:, None, None, None, :] + (ijk[None] + 0.5) * cell[:, None, None, None, :]


class FactorGrid(list):
    """A list of anisotropically factorized grids (reference ``FactorGrid``,
    factor_grid.py:28-267 — the FIGConvNet representation). Registered as a
    pytree via list."""

    @property
    def batch_size(self) -> int:
        return self[0].batch_size

    @classmethod
    def create(
        cls,
        grid_shapes: Sequence[Sequence[int]],
        num_channels: int,
        batch_size: int = 1,
        bounds: Optional[jnp.ndarray] = None,
        memory_formats: Optional[Sequence[str]] = None,
        dtype=jnp.float32,
    ) -> "FactorGrid":
        if memory_formats is None:
            # Default: compress the smallest axis of each factor grid.
            memory_formats = []
            for gs in grid_shapes:
                ax = int(np.argmin(gs))
                memory_formats.append(
                    {0: "b_xc_y_z", 1: "b_yc_x_z", 2: "b_zc_x_y"}[ax]
                )
        return cls(
            Grid.from_shape(gs, num_channels, batch_size, bounds, fmt, dtype)
            for gs, fmt in zip(grid_shapes, memory_formats)
        )
