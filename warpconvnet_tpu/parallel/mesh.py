"""Device-mesh utilities and sharded training.

The reference delegates distribution to torch DDP/FSDP (SURVEY.md section 2.3
— data-parallel only, zero collectives in library code). Here parallelism is
jax-native: a ("data", "model") mesh; geometry batches shard on "data"
(whole scenes per shard — the batched-padded layout shards with zero
re-packing); channel dimensions of conv/dense kernels shard on "model"
(tensor parallelism), with XLA inserting the collectives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"n_devices={n} not divisible by model_parallel={model_parallel}"
        )
    if n > len(devices):
        raise ValueError(
            f"make_mesh(n_devices={n}) but only {len(devices)} JAX devices are "
            f"visible. For a virtual CPU mesh, start the process with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and force "
            f"the cpu platform (jax.config.update('jax_platforms', 'cpu')) "
            f"before first backend use — __graft_entry__.dryrun_multichip does "
            f"this automatically via subprocess re-exec."
        )
    arr = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Geometry batches shard on the leading (batch) axis."""
    return NamedSharding(mesh, P("data"))


def shard_geometry(geometry, mesh: Mesh):
    """Place a Points/Voxels batch with the batch axis over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), geometry)


def param_partition_spec(path: Tuple, value) -> P:
    """Tensor-parallel partitioning rules for library parameters.

    Sparse-conv kernels [K, Cin, Cout] and dense kernels [Cin, Cout] shard
    their output-channel dim on "model"; biases/norm scales shard likewise.
    """
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "kernel" and getattr(value, "ndim", 0) == 3:
        return P(None, None, "model")
    if name == "kernel" and getattr(value, "ndim", 0) == 2:
        return P(None, "model")
    return P()


def shard_params(params, mesh: Mesh, tensor_parallel: bool = False):
    """Place parameters: replicated, or TP-sharded per the rules above."""

    def place(path, v):
        spec = param_partition_spec(path, v) if tensor_parallel else P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
