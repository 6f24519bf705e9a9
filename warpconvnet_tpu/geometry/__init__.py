from warpconvnet_tpu.geometry.base import GeometryMixin, pytree_dataclass
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.geometry.batched import (
    pad_stack,
    unpad,
    round_up_bucket,
    offsets_from_num_valid,
)
