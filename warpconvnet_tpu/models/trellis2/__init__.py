from warpconvnet_tpu.models.trellis2.sparse_structure import (
    SparseStructureDecoder,
    SparseStructureEncoder,
    SparseStructureFlowModel,
)
from warpconvnet_tpu.models.trellis2.shape_vae import (
    ShapeVaeDecoder,
    ShapeVaeEncoder,
)
from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel
from warpconvnet_tpu.models.trellis2.pipeline import Trellis2ImageTo3DPipeline
