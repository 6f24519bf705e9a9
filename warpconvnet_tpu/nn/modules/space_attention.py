"""Window ("space") attention modules + SpaCeFormer blocks.

Reference: ``warpconvnet/nn/modules/space_attention.py`` (``SpaceAttention:29``,
``AllAttention:238``, ``SpaCeFormerBlockBase:264``) and the counting-sort
window grouping in ``nn/functional/voxel_encode.py:237-302``.

The TPU formulation replaces counting-sort + varlen flash with the exact
banded-tile scheme in :mod:`warpconvnet_tpu.nn.functional.window_attention`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.nn.functional.attention import (
    apply_rope,
    rope_3d_phases,
)
from warpconvnet_tpu.nn.functional.window_attention import (
    window_attention,
    window_partition,
)
from warpconvnet_tpu.nn.modules.attention import Attention, FeedForward, PatchAttention


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class SpaceAttention(nn.Module):
    """Sparse 3D window attention over :class:`Voxels` (reference
    ``SpaceAttention:29``).

    ``window_size``: per-axis voxel window. ``shift``: half-window offset
    (the reference's fractional window shifting) — alternate blocks set it
    True for cross-window mixing. ``rope_base`` enables 3D coordinate RoPE
    on in-window local coordinates.
    """

    dim: int
    window_size: Union[int, Sequence[int]] = 8
    num_heads: int = 8
    shift: bool = False
    rope_base: Optional[float] = None
    tile: Optional[int] = None  # default: prod(window_size) rounded to 128

    @nn.compact
    def __call__(self, voxels: Voxels) -> Voxels:
        ws = _as3(self.window_size)
        x = voxels.features
        b, n, c = x.shape
        h = self.num_heads
        d = self.dim // h

        occupancy = int(np.prod(ws))
        tile = self.tile or max(128, _round_up(occupancy, 128))
        assert tile >= occupancy, (
            f"tile {tile} must cover max window occupancy {occupancy}"
        )
        assert n % tile == 0, (
            f"padded N {n} must be divisible by tile {tile}; pad the voxel "
            f"capacity accordingly"
        )

        sh = tuple(w // 2 for w in ws) if self.shift else (0, 0, 0)
        perm, inv, wcoords = window_partition(
            voxels.coords, voxels.num_valid, ws, sh
        )

        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = jnp.take_along_axis(qkv, perm[..., None], axis=1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)

        if self.rope_base is not None:
            coords_s = jnp.take_along_axis(voxels.coords, perm[..., None], axis=1)
            cos, sin = rope_3d_phases(coords_s, d, self.rope_base, jnp.float32)
            cos, sin = cos[..., None, :], sin[..., None, :]
            q = apply_rope(q, cos, sin).astype(x.dtype)
            k = apply_rope(k, cos, sin).astype(x.dtype)

        row_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
            < voxels.num_valid[:, None]
        )
        out = window_attention(q, k, v, wcoords, row_valid, tile)
        out = out.reshape(b, n, self.dim)
        out = jnp.take_along_axis(out, inv[..., None], axis=1)
        out = nn.Dense(self.dim, name="proj")(out)
        out = jnp.where(voxels.valid_mask()[..., None], out, 0)
        return voxels.replace(features=out)


class AllAttention(nn.Module):
    """Full attention across each scene's valid voxels (reference
    ``AllAttention:238`` — window="all")."""

    dim: int
    num_heads: int = 8
    rope_base: Optional[float] = None

    @nn.compact
    def __call__(self, voxels: Voxels) -> Voxels:
        mask = voxels.valid_mask()
        out = Attention(
            self.dim, self.num_heads, rope_base=self.rope_base, name="attn"
        )(voxels.features, mask, voxels.coords if self.rope_base else None)
        out = jnp.where(mask[..., None], out, 0)
        return voxels.replace_features(out)


class SpaCeFormerBlock(nn.Module):
    """Pre-norm block alternating SPace (window) and CurvE (serialized patch)
    attention (reference ``SpaCeFormerBlockBase:264`` and subclasses).

    ``mode``: 'space' (window attention, optionally shifted), 'curve'
    (Morton-serialized patch attention), or 'all' (full attention).
    """

    dim: int
    num_heads: int = 8
    mode: str = "space"
    window_size: Union[int, Sequence[int]] = 8
    patch_size: int = 1024
    shift: bool = False
    order: str = "xyz"
    hidden_ratio: float = 4.0
    rope_base: Optional[float] = None
    tile: Optional[int] = None

    @nn.compact
    def __call__(self, voxels: Voxels) -> Voxels:
        x = voxels.features
        normed = voxels.replace(features=nn.LayerNorm()(x))
        if self.mode == "space":
            attn_out = SpaceAttention(
                self.dim,
                self.window_size,
                self.num_heads,
                shift=self.shift,
                rope_base=self.rope_base,
                tile=self.tile,
                name="attn",
            )(normed)
        elif self.mode == "curve":
            attn_out = PatchAttention(
                self.dim,
                patch_size=self.patch_size,
                num_heads=self.num_heads,
                order=self.order,
                rope_base=self.rope_base,
                name="attn",
            )(normed)
        elif self.mode == "all":
            attn_out = AllAttention(
                self.dim, self.num_heads, rope_base=self.rope_base, name="attn"
            )(normed)
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        x = x + attn_out.features
        y = FeedForward(self.dim, self.hidden_ratio, name="mlp")(nn.LayerNorm()(x))
        x = x + y
        x = jnp.where(voxels.valid_mask()[..., None], x, 0)
        return voxels.replace(features=x)
