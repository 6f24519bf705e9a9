from warpconvnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    shard_geometry,
    shard_params,
    param_partition_spec,
)
from warpconvnet_tpu.parallel.train import (
    TrainState,
    create_train_state,
    make_segmentation_train_step,
    shard_train_state,
)
