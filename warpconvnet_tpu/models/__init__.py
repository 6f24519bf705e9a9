from warpconvnet_tpu.models.mink_unet import (
    MinkUNetBase,
    MinkUNet18,
    MinkUNet34,
    MinkUNet50,
    MinkUNet101,
    PointMinkUNetBase,
    PointMinkUNet18,
    PointMinkUNet34,
    BasicBlock,
    BottleneckBlock,
    ConvBlock,
)

from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3
from warpconvnet_tpu.models.space_former import SpaCeFormer, SpaCeFormerInstanceSeg
from warpconvnet_tpu.models.pointnet import PointNet, PointNetSeg
from warpconvnet_tpu.models.dgcnn import DGCNN
from warpconvnet_tpu.models.fcgf import ResUNet2
from warpconvnet_tpu.models.fig_convnet import FIGConvNet
from warpconvnet_tpu.models.mask_former import MaskFormer
from warpconvnet_tpu.models.volt import VOLT_VARIANTS, Volt, build_volt
