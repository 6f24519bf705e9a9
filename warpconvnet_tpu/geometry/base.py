"""Geometry base types — TPU-native redesign of the reference's
``Geometry``/``BatchedTensor`` hierarchy (``warpconvnet/geometry/base/``).

The reference stores a ragged batch as one concatenated tensor plus CPU
offsets (``geometry/base/batched.py:15-270``). On TPU every shape must be
static under jit, so the primary layout here is **batched-padded**:

    coords   [B, N, 3]    (int32 for Voxels, float for Points)
    features [B, N, C]
    num_valid [B] int32   — valid rows are ALWAYS the first num_valid rows

This layout vmaps per scene, shards over a device mesh on the batch axis with
zero re-packing, and turns the reference's segmented ops into plain masked
ops. Conversion helpers to/from ragged lists live in
:mod:`warpconvnet_tpu.geometry.batched`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pytree_dataclass(cls=None, *, meta_fields: Tuple[str, ...] = ()):
    """Register a frozen dataclass as a JAX pytree with static meta fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    return wrap if cls is None else wrap(cls)


class GeometryMixin:
    """Shared behavior for batched geometry types.

    Subclasses must have fields ``coords [B,N,3]``, ``features [B,N,C]``,
    ``num_valid [B]``.
    """

    # --- shape properties -------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def max_num_points(self) -> int:
        return self.coords.shape[1]

    @property
    def num_channels(self) -> int:
        return self.features.shape[-1]

    # Reference-compatible aliases (geometry/base/geometry.py `.feats`/`.coords`).
    @property
    def feats(self) -> jnp.ndarray:
        return self.features

    def valid_mask(self) -> jnp.ndarray:
        """[B, N] bool — True for real (non-padding) rows."""
        n = self.max_num_points
        iota = lax.broadcasted_iota(jnp.int32, (self.batch_size, n), 1)
        return iota < self.num_valid[:, None]

    def total_valid(self) -> jnp.ndarray:
        return jnp.sum(self.num_valid)

    # --- functional updates ------------------------------------------------
    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)

    def replace_features(self, features: jnp.ndarray):
        """New geometry with the same coordinates and new features
        (reference ``Geometry.replace`` / ``replace_features``)."""
        assert features.shape[:2] == self.features.shape[:2], (
            f"feature rows {features.shape[:2]} != {self.features.shape[:2]}"
        )
        return dataclasses.replace(self, features=features)

    def mask_features(self):
        """Zero features on padding rows."""
        return self.replace_features(
            jnp.where(self.valid_mask()[..., None], self.features, 0)
        )

    # --- feature arithmetic (reference geometry.py:300-388) ----------------
    def _binary_op(self, other, op):
        if isinstance(other, GeometryMixin):
            other = other.features
        return self.replace_features(op(self.features, other))

    def __add__(self, other):
        return self._binary_op(other, jnp.add)

    def __sub__(self, other):
        return self._binary_op(other, jnp.subtract)

    def __mul__(self, other):
        return self._binary_op(other, jnp.multiply)

    def __truediv__(self, other):
        return self._binary_op(other, jnp.divide)
