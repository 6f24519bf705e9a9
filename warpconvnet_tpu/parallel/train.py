"""Sharded training step for geometry models.

Data parallelism: the batch axis of the padded geometry shards over the
"data" mesh axis; gradients are averaged implicitly by XLA (the loss is a
global mean over shards). Optional tensor parallelism shards conv/dense
output channels over "model".
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from warpconvnet_tpu.parallel.mesh import batch_sharding, shard_geometry, shard_params


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, tx, example_input, rng=None, **apply_kwargs) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, example_input, **apply_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))


def make_segmentation_train_step(model, tx, num_classes: int) -> Callable:
    """Returns jittable step(state, voxels, labels) -> (state, metrics).

    Labels: [B, N] int32; padded rows are ignored via the validity mask.
    """

    @jax.jit
    def step(state: TrainState, voxels, labels):
        mask = voxels.valid_mask()

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                voxels, train=True, mutable=["batch_stats"],
            )
            logits = out.features.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / jnp.maximum(
                jnp.sum(mask), 1
            )
            return loss, (updates.get("batch_stats", state.batch_stats), acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, bs, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    return step


def shard_train_state(state: TrainState, mesh: Mesh, tensor_parallel: bool = False):
    """Replicate (or TP-shard) the train state over the mesh."""
    params = shard_params(state.params, mesh, tensor_parallel)
    repl = NamedSharding(mesh, P())
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state.batch_stats
    )
    # Optimizer moments mirror the param tree (same leaf names), so the same
    # partitioning rules apply.
    opt_state = shard_params(state.opt_state, mesh, tensor_parallel)
    step = jax.device_put(state.step, repl)
    return TrainState(params, batch_stats, opt_state, step)
