from warpconvnet_tpu.geometry.base import GeometryMixin, pytree_dataclass
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.geometry.batched import (
    pad_stack,
    unpad,
    round_up_bucket,
    offsets_from_num_valid,
)
from warpconvnet_tpu.geometry.grid import Grid, FactorGrid
from warpconvnet_tpu.geometry.conversions import (
    points_to_grid,
    voxels_to_grid,
    points_to_factor_grid,
    grid_sample_points,
)
