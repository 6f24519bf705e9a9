"""warpconvnet_tpu — TPU-native 3D deep learning (sparse voxels + point clouds).

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
NVlabs/WarpConvNet: geometry types, coordinate machinery, spatially sparse
convolution, sparse attention, and reference models — designed for the TPU
compilation model (static shapes, sort-based coordinate indexing, MXU-tiled
implicit GEMM, pjit data parallelism).
"""

__version__ = "0.1.0"

from warpconvnet_tpu.constants import (
    get_fp16_accum,
    set_fp16_accum,
    get_low_precision_accum,
    set_low_precision_accum,
)
