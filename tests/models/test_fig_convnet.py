"""FIGConvNet + FactorGrid module tests (reference tests for factor grids
and models/fig_convnet.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points


def _points(rng, b=2, n=256, c=3):
    coords = rng.uniform(0, 1, (b, n, 3)).astype(np.float32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    nv = np.array([n, n - 30], np.int32)
    return Points.create(coords, feats, nv)


def test_factor_grid_modules():
    from warpconvnet_tpu.geometry.conversions import points_to_factor_grid
    from warpconvnet_tpu.nn.modules.factor_grid import (
        FactorGridConv,
        FactorGridIntraCommunication,
        FactorGridToPoint,
        factor_grid_cat,
    )

    rng = np.random.default_rng(0)
    pts = _points(rng, c=8)
    shapes = ((16, 16, 2), (16, 2, 16), (2, 16, 16))
    grids = points_to_factor_grid(pts, shapes, reduction="mean")
    assert len(grids) == 3
    assert grids[0].memory_format in ("b_zc_x_y", "b_xc_y_z", "b_yc_x_z")

    conv = FactorGridConv(8, 16)
    params = conv.init(jax.random.PRNGKey(0), grids)
    out = conv.apply(params, grids)
    assert out[0].num_channels == 16
    assert out[0].grid_shape == shapes[0]

    comm = FactorGridIntraCommunication()
    params = comm.init(jax.random.PRNGKey(1), out)
    out2 = comm.apply(params, out)
    assert out2[1].grid_shape == shapes[1]

    cat = factor_grid_cat(out, out)
    assert cat[0].num_channels == 32

    top = FactorGridToPoint(grid_channels=16, out_channels=24)
    params = top.init(jax.random.PRNGKey(2), out, pts)
    sampled = top.apply(params, out, pts)
    assert sampled.features.shape == (2, 256, 24)


@pytest.mark.slow
def test_fig_convnet_forward_and_global_head():
    from warpconvnet_tpu.models.fig_convnet import FIGConvNet

    rng = np.random.default_rng(1)
    pts = _points(rng, n=128, c=3)
    model = FIGConvNet(
        in_channels=3,
        out_channels=4,
        hidden=8,
        grid_shapes=((16, 16, 2), (2, 16, 16)),
        levels=1,
        global_out_channels=1,
    )
    params = model.init(jax.random.PRNGKey(0), pts)
    per_point, g = model.apply(params, pts)
    assert per_point.shape == (2, 128, 4)
    assert g.shape == (2, 1)
    assert np.isfinite(np.asarray(per_point)).all()

    def loss(p):
        pp, gg = model.apply(p, pts)
        return jnp.sum(pp ** 2) + jnp.sum(gg ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(grads))
