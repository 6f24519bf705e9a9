"""GridConv + checkpoint utils + gradient checkpointing tests."""

import numpy as np
import jax
import jax.numpy as jnp


def test_grid_conv_formats():
    from warpconvnet_tpu.geometry.grid import Grid
    from warpconvnet_tpu.nn.modules.grid_conv import GridConv

    rng = np.random.default_rng(0)
    for fmt in ("b_x_y_z_c", "b_c_x_y_z", "b_zc_x_y"):
        g = Grid.from_shape((8, 8, 4), 6, batch_size=2, memory_format=fmt)
        g = g.replace_features(
            jnp.asarray(rng.standard_normal(g.features.shape), jnp.float32)
        )
        conv = GridConv(6, 12, 3)
        params = conv.init(jax.random.PRNGKey(0), g)
        out = conv.apply(params, g)
        assert out.num_channels == 12
        assert out.memory_format == fmt
        assert out.canonical_features().shape == (2, 8, 8, 4, 12)


def test_grid_conv_strided():
    from warpconvnet_tpu.geometry.grid import Grid
    from warpconvnet_tpu.nn.modules.grid_conv import GridConv

    g = Grid.from_shape((8, 8, 8), 4, batch_size=1)
    conv = GridConv(4, 8, 2, stride=2)
    params = conv.init(jax.random.PRNGKey(0), g)
    out = conv.apply(params, g)
    assert out.grid_shape == (4, 4, 4)


def test_checkpoint_roundtrip(tmp_path):
    from warpconvnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    p = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = load_checkpoint(p, jax.tree.map(np.asarray, state))
    np.testing.assert_allclose(restored["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_checkpoint_module_remat_matches():
    """Rematerialized block computes identical values + grads."""
    import flax.linen as nn
    from warpconvnet_tpu.nn.modules.gradient_checkpointing import (
        checkpoint_module,
    )

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8)(jax.nn.gelu(nn.Dense(16)(x)))

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    blk = Block()
    params = blk.init(jax.random.PRNGKey(0), x)
    rblk = checkpoint_module(Block, policy="dots")()
    out_a = blk.apply(params, x)
    out_b = rblk.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(blk.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(rblk.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
