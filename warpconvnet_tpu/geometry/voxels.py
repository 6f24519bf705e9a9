"""Sparse voxel geometry (reference ``warpconvnet/geometry/types/voxels.py``).

Batched-padded layout: coords int32 [B, N, 3] (PAD_COORD on padding rows,
valid rows first), features [B, N, C], num_valid [B]. ``voxel_size`` and
``tensor_stride`` are static metadata, as in the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.geometry.base import GeometryMixin, pytree_dataclass
from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.ops.morton import morton_argsort
from warpconvnet_tpu.ops.unique import unique_coords
from warpconvnet_tpu.ops.reductions import row_reduction


def _as3(v) -> Tuple[int, ...]:
    if isinstance(v, (int, float, np.integer, np.floating)):
        return (v,) * 3
    return tuple(v)


@pytree_dataclass(meta_fields=("voxel_size", "tensor_stride", "lex_sorted"))
class Voxels(GeometryMixin):
    """Batch of sparse voxel grids.

    Attributes:
      coords: [B, N, 3] int32 voxel indices (padding rows = PAD_COORD).
      features: [B, N, C].
      num_valid: [B] int32 — valid rows are the first num_valid per scene.
      voxel_size: static per-axis float size (world units per stride-1 voxel).
      tensor_stride: static per-axis int stride.
      lex_sorted: static flag — coords are lexicographically sorted per scene
        (the coordinate engine's canonical order). Set by :meth:`lex_sort`,
        :meth:`unique`, and all conv/pool outputs; it is the contract that
        enables the fused Pallas plan + GEMM backends (monotone pair-table
        rows), so "auto" dispatch picks them without env flags.
    """

    coords: jnp.ndarray
    features: jnp.ndarray
    num_valid: jnp.ndarray
    voxel_size: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    tensor_stride: Tuple[int, int, int] = (1, 1, 1)
    lex_sorted: bool = False

    def __post_init__(self):
        # AOT lowering APIs (jit(...).lower) reconstruct pytrees with ArgInfo
        # leaves that carry no .ndim; validate only on real array leaves.
        if hasattr(self.coords, "ndim"):
            assert self.coords.ndim == 3 and self.coords.shape[-1] == 3, self.coords.shape
        if hasattr(self.features, "ndim"):
            assert self.features.ndim == 3, self.features.shape

    @classmethod
    def create(cls, coords, features, num_valid, voxel_size=1.0, tensor_stride=1):
        return cls(
            coords=jnp.asarray(coords, jnp.int32),
            features=jnp.asarray(features),
            num_valid=jnp.asarray(num_valid, jnp.int32),
            voxel_size=_as3(float(voxel_size) if np.isscalar(voxel_size) else voxel_size),
            tensor_stride=tuple(int(s) for s in _as3(tensor_stride)),
        )

    # --- ordering / dedup ---------------------------------------------------
    def sort(self, ordering: str = "xyz") -> "Voxels":
        """Morton-sort each scene's voxels (reference ``Voxels.sort``).

        Coordinates are shifted per scene to be non-negative before encoding.
        """

        def one(coords, feats, nv):
            n = coords.shape[0]
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            cmin = jnp.min(jnp.where(valid[:, None], coords, PAD_COORD), axis=0)
            shifted = jnp.where(valid[:, None], coords - cmin, PAD_COORD)
            perm, _ = morton_argsort(shifted, valid, ordering)
            return coords[perm], feats[perm]

        c, f = jax.vmap(one)(self.coords, self.features, self.num_valid)
        return self.replace(coords=c, features=f, lex_sorted=False)

    def lex_sort(self) -> "Voxels":
        """Lexicographically sort each scene's voxels (x, y, z ascending).

        This is the canonical order of the coordinate engine: kernel maps on
        lex-sorted inputs have monotone pair-table rows, which the Pallas
        implicit-GEMM backend requires (kernels/implicit_gemm.py window
        contract). ``unique``/``stride`` outputs are already in this order.
        """
        from warpconvnet_tpu.ops.keys import argsort_keys, pack_coords

        def one(coords, feats, nv):
            n = coords.shape[0]
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            c = jnp.where(valid[:, None], coords, PAD_COORD)
            _, perm = argsort_keys(pack_coords(c))
            return coords[perm], feats[perm]

        c, f = jax.vmap(one)(self.coords, self.features, self.num_valid)
        return self.replace(coords=c, features=f, lex_sorted=True)

    def unique(self, reduction: str = "sum") -> "Voxels":
        """Deduplicate voxel coords per scene, reducing duplicate features
        (reference ``Voxels.unique``). Output capacity = current N."""
        n = self.max_num_points

        def one(coords, feats, nv):
            valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            res = unique_coords(coords, valid, max_out=n)
            red = row_reduction(feats, res.to_unique, n, reduction, counts=res.counts)
            return res.coords, red, jnp.minimum(res.num_unique, n)

        c, f, nv = jax.vmap(one)(self.coords, self.features, self.num_valid)
        return self.replace(coords=c, features=f, num_valid=nv, lex_sorted=True)

    # --- conversions ----------------------------------------------------------
    def to_point(self) -> "jnp.ndarray":
        """World-space centers: coords * voxel_size * tensor_stride
        (reference ``Voxels.to_point``). Returns float [B, N, 3]."""
        scale = jnp.asarray(
            [v * s for v, s in zip(self.voxel_size, self.tensor_stride)],
            self.features.dtype if jnp.issubdtype(self.features.dtype, jnp.floating) else jnp.float32,
        )
        return self.coords.astype(scale.dtype) * scale

    def to_dense(
        self,
        grid_shape: Tuple[int, int, int],
        min_coord: Optional[jnp.ndarray] = None,
        channel_last: bool = False,
    ) -> jnp.ndarray:
        """Scatter into a dense grid [B, C, X, Y, Z] (reference
        ``Voxels.to_dense``, ``types/voxels.py``). ``grid_shape`` is static;
        out-of-window voxels are dropped."""
        b, n, c = self.features.shape
        gx, gy, gz = grid_shape
        coords = self.coords
        if min_coord is not None:
            coords = coords - jnp.asarray(min_coord, jnp.int32).reshape(1, 1, 3)
        inside = (
            self.valid_mask()
            & (coords >= 0).all(-1)
            & (coords < jnp.asarray(grid_shape, jnp.int32)).all(-1)
        )
        flat = (coords[..., 0] * gy + coords[..., 1]) * gz + coords[..., 2]
        flat = jnp.where(inside, flat, gx * gy * gz)  # overflow cell, dropped
        feats = jnp.where(inside[..., None], self.features, 0)

        def one(fl, fe):
            dense = jnp.zeros((gx * gy * gz + 1, c), fe.dtype)
            return dense.at[fl].add(fe, mode="drop")[:-1]

        dense = jax.vmap(one)(flat, feats).reshape(b, gx, gy, gz, c)
        if channel_last:
            return dense
        return jnp.transpose(dense, (0, 4, 1, 2, 3))

    @classmethod
    def from_dense(
        cls,
        dense: jnp.ndarray,
        max_out: int,
        channel_last: bool = False,
        voxel_size=1.0,
        tensor_stride=1,
    ) -> "Voxels":
        """Extract non-empty cells from dense [B, C, X, Y, Z] (reference
        ``Voxels.from_dense``). A cell is active if any channel is nonzero.
        Active cells are compacted to the front (sorted by flat index)."""
        if not channel_last:
            dense = jnp.transpose(dense, (0, 2, 3, 4, 1))
        b, gx, gy, gz, c = dense.shape
        flat = dense.reshape(b, gx * gy * gz, c)
        active = jnp.any(flat != 0, axis=-1)

        def one(feat, act):
            n = feat.shape[0]
            idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
            sort_key = jnp.where(act, idx, n)
            order = jnp.argsort(sort_key)
            sel = order[:max_out]
            nv = jnp.minimum(jnp.sum(act.astype(jnp.int32)), max_out)
            ii = sel // (gy * gz)
            jj = (sel // gz) % gy
            kk = sel % gz
            coords = jnp.stack([ii, jj, kk], -1).astype(jnp.int32)
            row_valid = lax.broadcasted_iota(jnp.int32, (max_out,), 0) < nv
            coords = jnp.where(row_valid[:, None], coords, PAD_COORD)
            feats = jnp.where(row_valid[:, None], feat[sel], 0)
            return coords, feats, nv

        coords, feats, nv = jax.vmap(one)(flat, active)
        return cls.create(coords, feats, nv, voxel_size, tensor_stride)
