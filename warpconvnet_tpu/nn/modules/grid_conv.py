"""Dense grid convolution with memory-format awareness (reference
``nn/modules/grid_conv.py`` GridConv + conv3d_blocks).

Full (non-factorized) formats run a true 3D conv; factorized formats run the
2D conv with the compressed axis folded into channels (see
:mod:`warpconvnet_tpu.nn.modules.factor_grid` for the per-grid suite).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.grid import FACTORIZED_FORMATS, Grid


class GridConv(nn.Module):
    """Conv over a :class:`Grid` in its native memory format."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1

    @nn.compact
    def __call__(self, grid: Grid) -> Grid:
        ks = (
            (self.kernel_size,) * 3
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (
            (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        )
        if grid.memory_format in FACTORIZED_FORMATS:
            comp_ax = FACTORIZED_FORMATS[grid.memory_format]
            comp = grid.grid_shape[comp_ax]
            f = jnp.moveaxis(grid.features, 1, -1)  # [B, A1, A2, comp*C]
            axes2d = [ax for ax in range(3) if ax != comp_ax]
            f = nn.Conv(
                self.out_channels * comp,
                tuple(ks[a] for a in axes2d),
                strides=tuple(st[a] for a in axes2d),
                padding="SAME",
            )(f)
            f = jnp.moveaxis(f, -1, 1)
            new_shape = tuple(
                s if ax == comp_ax else max(s // st[ax], 1)
                for ax, s in enumerate(grid.grid_shape)
            )
            return Grid(
                features=f,
                bounds=grid.bounds,
                grid_shape=new_shape,
                num_channels=self.out_channels,
                memory_format=grid.memory_format,
            )
        canon = grid.canonical_features()  # [B, X, Y, Z, C]
        f = nn.Conv(self.out_channels, ks, strides=st, padding="SAME")(canon)
        new_shape = tuple(max(s // t, 1) for s, t in zip(grid.grid_shape, st))
        out = Grid(
            features=f,
            bounds=grid.bounds,
            grid_shape=new_shape,
            num_channels=self.out_channels,
            memory_format="b_x_y_z_c",
        )
        return out.to_memory_format(grid.memory_format)
