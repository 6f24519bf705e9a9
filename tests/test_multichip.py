"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (conftest)."""

import numpy as np
import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dp_matches_single_device():
    """Data-parallel sharded step must produce the same loss as unsharded."""
    import optax
    import __graft_entry__ as ge
    from warpconvnet_tpu.models.mink_unet import MinkUNetBase
    from warpconvnet_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_segmentation_train_step,
        shard_geometry,
        shard_train_state,
    )
    import jax.numpy as jnp

    model = MinkUNetBase(
        in_channels=3, out_channels=8,
        planes=(8, 8, 8, 8, 8, 8, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1), init_dim=8,
    )
    vox = ge._example_voxels(b=4, n=256, grid=12)
    labels = jnp.zeros((4, 256), jnp.int32)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, tx, vox, train=False)
    step = make_segmentation_train_step(model, tx, num_classes=8)

    _, m_single = step(state, vox, labels)

    mesh = make_mesh(4, model_parallel=1)
    with mesh:
        sharded_state = shard_train_state(state, mesh)
        svox = shard_geometry(vox, mesh)
        slabels = shard_geometry(labels, mesh)
        _, m_sharded = step(sharded_state, svox, slabels)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
    )
