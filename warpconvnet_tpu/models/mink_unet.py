"""MinkUNet family (reference ``warpconvnet/models/mink_unet.py:251-563``).

Sparse ResNet U-Net: stem conv, 4 stride-2 downsamples each followed by a
residual-block stage, 4 transposed-conv upsamples with skip concatenation,
1x1 head (reference ``forward``, mink_unet.py:367-405).

TPU-specific design:
* Per-level static capacities (``capacities``) bound the padded voxel count
  at each stride level — the shape-bucketing that keeps jit recompile-free.
* Kernel maps are built once per stage and threaded explicitly: all
  submanifold 3^3 convs at a level share one map; each decoder stage reuses
  the encoder's strided map reversed (the reference's IntSearchCache /
  spatial_cache, functionalized).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.norms import BatchNorm
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d


class ConvBlock(nn.Module):
    """conv -> BN -> ReLU (reference mink_unet.py:36-56)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    transposed: bool = False
    out_capacity: Optional[int] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Voxels, out_coords=None, pair_table=None, train: bool = True):
        x, table = SparseConv3d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            transposed=self.transposed,
            out_capacity=self.out_capacity,
            compute_dtype=self.compute_dtype,
        )(x, out_coords=out_coords, pair_table=pair_table)
        x = BatchNorm(self.out_channels)(x, use_running_average=not train)
        x = x.replace_features(jax.nn.relu(x.features))
        return x, table


class BasicBlock(nn.Module):
    """Two 3^3 submanifold convs + skip (reference mink_unet.py:122-174).
    Both convs share one kernel map (returned for stage-level reuse)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: Voxels, pair_table=None, train: bool = True):
        residual = x
        out, table = SparseConv3d(self.in_channels, self.out_channels, 3)(
            x, pair_table=pair_table, out_coords=x if pair_table is not None else None
        )
        out = BatchNorm(self.out_channels)(out, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features))
        out, _ = SparseConv3d(self.out_channels, self.out_channels, 3)(
            out, pair_table=table, out_coords=out
        )
        out = BatchNorm(self.out_channels)(out, use_running_average=not train)
        if self.in_channels != self.out_channels:
            residual, _ = SparseConv3d(self.in_channels, self.out_channels, 1)(residual)
            residual = BatchNorm(self.out_channels)(residual, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features + residual.features))
        return out, table


class BottleneckBlock(nn.Module):
    """1-3-1 bottleneck (reference mink_unet.py:185-244); internal width =
    out_channels // 4."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: Voxels, pair_table=None, train: bool = True):
        width = self.out_channels // 4
        residual = x
        out, _ = SparseConv3d(self.in_channels, width, 1)(x)
        out = BatchNorm(width)(out, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features))
        out, table = SparseConv3d(width, width, 3)(
            out, pair_table=pair_table,
            out_coords=out if pair_table is not None else None,
        )
        out = BatchNorm(width)(out, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features))
        out, _ = SparseConv3d(width, self.out_channels, 1)(out)
        out = BatchNorm(self.out_channels)(out, use_running_average=not train)
        if self.in_channels != self.out_channels:
            residual, _ = SparseConv3d(self.in_channels, self.out_channels, 1)(residual)
            residual = BatchNorm(self.out_channels)(residual, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features + residual.features))
        return out, table


class MinkUNetBase(nn.Module):
    """Reference MinkUNetBase (mink_unet.py:251).

    ``capacities``: static padded voxel counts at stride levels 1,2,4,8,16
    (len 5); defaults to halving per level.
    """

    in_channels: int
    out_channels: int
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    init_dim: int = 32
    init_kernel_size: int = 1
    block: str = "basic"  # "basic" | "bottleneck"
    capacities: Optional[Tuple[int, ...]] = None
    remat: bool = False

    def _caps(self, n: int) -> Tuple[int, ...]:
        if self.capacities is not None:
            return self.capacities
        return tuple(max(n // (2 ** i), 128) for i in range(5))

    @nn.compact
    def __call__(self, x: Voxels, train: bool = True) -> Voxels:
        blk_cls = BasicBlock if self.block == "basic" else BottleneckBlock
        if self.remat:
            blk_cls = nn.remat(blk_cls, static_argnums=(3,), prevent_cse=False)

        def stage(x, in_ch, out_ch, n, name, table=None):
            ch = in_ch
            for i in range(n):
                x, table = blk_cls(ch, out_ch, name=f"{name}_{i}")(x, table, train)
                ch = out_ch
            return x, table

        caps = self._caps(x.max_num_points)
        p, l = self.planes, self.layers

        # Stem (conv0) at stride 1.
        out_p1, _ = ConvBlock(self.in_channels, self.init_dim,
                              self.init_kernel_size, name="conv0")(x, train=train)

        # Encoder: 4 x (stride-2 ConvBlock + block stage).
        skips = [out_p1]
        tables = []
        stage_tables = [None]  # submanifold 3^3 map per level (stride-1 has none yet)
        enc = out_p1
        in_chs = (self.init_dim, p[0], p[1], p[2])
        for s in range(4):
            enc, t = ConvBlock(in_chs[s], in_chs[s], 2, stride=2,
                               out_capacity=caps[s + 1], name=f"conv{s+1}")(
                enc, train=train)
            tables.append(t)
            enc, st = stage(enc, in_chs[s], p[s], l[s], f"block{s+1}")
            if s < 3:
                skips.append(enc)
                stage_tables.append(st)

        # Decoder: 4 x (transposed ConvBlock + skip concat + block stage).
        # Decoder stages run on the encoder skip coords, so they REUSE the
        # encoder stage's submanifold kernel map (the reference's
        # IntSearchCache hit, functionalized) — map builds are the dominant
        # coordinate cost on TPU.
        dec = enc
        dec_in = p[3]
        for s in range(4):
            skip = skips[3 - s]
            dec, _ = ConvBlock(dec_in, p[4 + s], 2, stride=2, transposed=True,
                               name=f"convtr{4+s}")(
                dec, out_coords=skip, pair_table=tables[3 - s].reversed(),
                train=train)
            dec = dec.replace_features(
                jnp.concatenate([dec.features, skip.features], axis=-1)
            )
            dec, _ = stage(dec, p[4 + s] + skip.num_channels, p[4 + s],
                           l[4 + s], f"block{5+s}",
                           table=stage_tables[3 - s])
            dec_in = p[4 + s]

        out, _ = SparseConv3d(dec_in, self.out_channels, 1, use_bias=True,
                              name="final")(dec)
        return out


class PointMinkUNetBase(nn.Module):
    """Point-cloud wrapper around :class:`MinkUNetBase` (reference
    ``mink_unet.py:459-540`` ``PointMinkUNetBase``): continuous PointConv on
    the raw points, voxel-pool into a sparse UNet, unpool back with skip
    concatenation, and a two-layer continuous conv head.

    The reference notes the continuous layers "can incur a significant
    performance penalty"; here the radius search runs on the cell-list
    path and the voxel pooling marks its output lex-sorted so the inner
    UNet keeps the probe/igemm fast paths.
    """

    in_channels: int
    out_channels: int
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    init_dim: int = 32
    block: str = "basic"
    voxel_size: float = 0.02
    voxel_capacity: Optional[int] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from warpconvnet_tpu.nn.functional.point_pool import point_pool, point_unpool
        from warpconvnet_tpu.nn.modules.point_conv import PointConv
        from warpconvnet_tpu.ops.search import RealSearchConfig

        search = RealSearchConfig("radius", radius=self.voxel_size)
        pc = PointConv(
            self.in_channels, self.init_dim, search=search,
            edge_hidden=2 * self.init_dim, name="point_conv",
        )(x)

        pooled, to_unique = point_pool(
            pc, self.voxel_size, reduction="mean",
            max_out=self.voxel_capacity, return_type="voxel",
        )
        st = MinkUNetBase(
            self.init_dim, self.planes[-1], planes=self.planes,
            layers=self.layers, init_dim=self.init_dim, block=self.block,
            remat=self.remat, name="unet",
        )(pooled, train=train)
        # Unpool (repeat mode) + skip-concat the pre-pool point features
        # (reference point_unpool(..., concat_unpooled_pc=True)).
        up = point_unpool(st.features, pc, to_unique)
        up = up.replace_features(
            jnp.concatenate([up.features, pc.features], axis=-1)
        )

        head_c = self.planes[-1]
        out = PointConv(
            head_c + self.init_dim, head_c, search=search,
            edge_hidden=head_c, name="last_conv0",
        )(up)
        out = BatchNorm(head_c)(out, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features))
        out = PointConv(
            head_c, head_c, search=search, edge_hidden=head_c,
            name="last_conv1",
        )(out)
        out = BatchNorm(head_c)(out, use_running_average=not train)
        out = out.replace_features(jax.nn.relu(out.features))
        out = out.replace_features(
            nn.Dense(self.out_channels, name="head")(out.features)
        )
        return out


def PointMinkUNet18(in_channels, out_channels, **kw):
    return PointMinkUNetBase(in_channels, out_channels,
                             planes=(32, 64, 128, 256, 256, 128, 96, 96),
                             layers=(2, 2, 2, 2, 2, 2, 2, 2), block="basic", **kw)


def PointMinkUNet34(in_channels, out_channels, **kw):
    return PointMinkUNetBase(in_channels, out_channels,
                             planes=(32, 64, 128, 256, 256, 128, 96, 96),
                             layers=(2, 3, 4, 6, 2, 2, 2, 2), block="basic", **kw)


def MinkUNet18(in_channels, out_channels, **kw):
    return MinkUNetBase(in_channels, out_channels,
                        planes=(32, 64, 128, 256, 256, 128, 96, 96),
                        layers=(2, 2, 2, 2, 2, 2, 2, 2), block="basic", **kw)


def MinkUNet34(in_channels, out_channels, **kw):
    return MinkUNetBase(in_channels, out_channels,
                        planes=(32, 64, 128, 256, 256, 128, 96, 96),
                        layers=(2, 3, 4, 6, 2, 2, 2, 2), block="basic", **kw)


def MinkUNet50(in_channels, out_channels, **kw):
    return MinkUNetBase(in_channels, out_channels,
                        planes=(128, 256, 512, 1024, 256, 128, 96, 96),
                        layers=(2, 3, 4, 6, 2, 2, 2, 2), block="bottleneck", **kw)


def MinkUNet101(in_channels, out_channels, **kw):
    return MinkUNetBase(in_channels, out_channels,
                        planes=(128, 256, 512, 1024, 256, 128, 96, 96),
                        layers=(2, 3, 4, 23, 2, 2, 2, 2), block="bottleneck", **kw)
