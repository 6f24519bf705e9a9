from warpconvnet_tpu.ops.keys import (
    PAD_COORD,
    pack_coords,
    sort_keys,
    argsort_keys,
    searchsorted_keys,
    lookup_in_sorted,
    unique_mask_sorted,
)
from warpconvnet_tpu.ops.unique import UniqueResult, unique_coords, voxel_downsample
from warpconvnet_tpu.ops.morton import (
    MORTON_ORDERINGS,
    morton_code_10bit,
    morton_keys,
    morton_argsort,
)
from warpconvnet_tpu.ops.kernel_map import (
    PairTable,
    kernel_offsets,
    identity_offset_index,
    build_pair_table,
    stride_coords,
    expand_coords,
)
