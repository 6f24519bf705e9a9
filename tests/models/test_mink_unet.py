import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.mink_unet import MinkUNet18, MinkUNetBase
from warpconvnet_tpu.ops.keys import PAD_COORD


def _make_voxels(rng, b=2, n=256, grid=24, c=3):
    coords, feats, nv = [], [], []
    for _ in range(b):
        raw = rng.integers(0, grid, size=(n, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cp = np.full((n, 3), PAD_COORD, np.int32)
        cp[: len(uniq)] = uniq
        f = np.zeros((n, c), np.float32)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c)).astype(np.float32)
        coords.append(cp)
        feats.append(f)
    return Voxels.create(np.stack(coords), np.stack(feats), np.array(nv))


@pytest.fixture(scope="module")
def small_unet():
    model = MinkUNetBase(
        in_channels=3, out_channels=5,
        planes=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        init_dim=8,
    )
    rng = np.random.default_rng(0)
    vox = _make_voxels(rng)
    params = model.init(jax.random.PRNGKey(0), vox, train=False)
    return model, params, vox


@pytest.mark.slow
def test_forward_shapes(small_unet):
    model, variables, vox = small_unet
    out = model.apply(variables, vox, train=False)
    assert out.features.shape == (2, 256, 5)
    # Output coords == input coords (UNet returns full resolution).
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(vox.coords))
    np.testing.assert_array_equal(np.asarray(out.num_valid), np.asarray(vox.num_valid))
    # Padded rows zero.
    nv = int(out.num_valid[0])
    assert np.all(np.asarray(out.features[0, nv:]) == 0)


def test_train_step_decreases_loss(small_unet):
    model, variables, vox = small_unet
    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 256)).astype(np.int32))
    mask = vox.valid_mask()

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, vox, train=True,
                mutable=["batch_stats"],
            )
            logits = out.features
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            loss = jnp.sum(ce * mask) / jnp.sum(mask)
            return loss, updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss

    losses = []
    for _ in range(5):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
class TestPointMinkUNet:
    """PointMinkUNetBase: point->voxel->point wrapper
    (reference mink_unet.py:459-540)."""

    def _make_points(self, rng, b=2, n=192, c=3):
        from warpconvnet_tpu.geometry.points import Points

        coords = rng.random((b, n, 3)).astype(np.float32)
        feats = rng.standard_normal((b, n, c)).astype(np.float32)
        nv = np.array([n, n - 40], np.int32)
        return Points.create(coords, feats, nv)

    def test_train_step_decreases_loss(self):
        from warpconvnet_tpu.models.mink_unet import PointMinkUNetBase

        model = PointMinkUNetBase(
            in_channels=3, out_channels=4,
            planes=(8, 16, 16, 16, 16, 16, 8, 8),
            layers=(1, 1, 1, 1, 1, 1, 1, 1),
            init_dim=8, voxel_size=0.1,
        )
        rng = np.random.default_rng(0)
        pts = self._make_points(rng)
        variables = model.init(jax.random.PRNGKey(0), pts, train=False)
        out = model.apply(variables, pts, train=False)
        # Output is at INPUT point resolution with head channels.
        assert out.features.shape == (2, 192, 4)
        np.testing.assert_array_equal(
            np.asarray(out.num_valid), np.asarray(pts.num_valid))

        labels = jnp.asarray(rng.integers(0, 4, size=(2, 192)).astype(np.int32))
        mask = pts.valid_mask()
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, pts, train=True,
                    mutable=["batch_stats"],
                )
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    out.features, labels)
                loss = jnp.sum(ce * mask) / jnp.sum(mask)
                return loss, updates["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, bs, opt_state, loss

        losses = []
        for _ in range(4):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
