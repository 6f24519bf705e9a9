from warpconvnet_tpu.models.mink_unet import (
    MinkUNetBase,
    MinkUNet18,
    MinkUNet34,
    MinkUNet50,
    MinkUNet101,
    BasicBlock,
    BottleneckBlock,
    ConvBlock,
)
