"""Sparse-2D MNIST-style digit classification (reference
``examples/train/mnist.py``): digit images become sparse 2D voxel sets
(active pixels), classified with SparseConv2d stacks + global pool.

Uses sklearn's 8x8 digits dataset (bundled, offline) upscaled to 16x16 —
same pipeline shape as the reference's MNIST example without downloads.

Usage: python examples/train_mnist.py [--steps 100] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
import optax

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_pool import global_pool
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv2d
from warpconvnet_tpu.ops.keys import PAD_COORD


def load_digits_sparse(capacity=128):
    from sklearn.datasets import load_digits

    digits = load_digits()
    images = np.kron(digits.images, np.ones((2, 2)))  # 8x8 -> 16x16
    labels = digits.target
    return images / 16.0, labels


def to_voxels(images, idx, capacity=128):
    b = len(idx)
    coords = np.full((b, capacity, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, capacity, 1), np.float32)
    nv = np.zeros((b,), np.int32)
    for i, j in enumerate(idx):
        ys, xs = np.nonzero(images[j] > 0.2)
        k = min(len(ys), capacity)
        coords[i, :k, 0] = xs[:k]
        coords[i, :k, 1] = ys[:k]
        coords[i, :k, 2] = 0
        feats[i, :k, 0] = images[j][ys[:k], xs[:k]]
        nv[i] = k
    return Voxels.create(coords, feats, nv)


class SparseDigitNet(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, vox: Voxels) -> jnp.ndarray:
        h, t = SparseConv2d(1, 32, 3, name="c1")(vox)
        h = h.replace_features(jax.nn.relu(nn.LayerNorm()(h.features)))
        h, _ = SparseConv2d(32, 64, 3, name="c2")(h, pair_table=t, out_coords=h)
        h = h.replace_features(jax.nn.relu(nn.LayerNorm()(h.features)))
        h, td = SparseConv2d(64, 64, 2, stride=2, name="down")(h)
        h2, t2 = SparseConv2d(64, 64, 3, name="c3")(h)
        h2 = h2.replace_features(jax.nn.relu(nn.LayerNorm()(h2.features)))
        h, _ = SparseConv2d(64, 64, 2, stride=2, name="down2")(h2)
        g = jnp.concatenate(
            [global_pool(h, "max"), global_pool(h, "mean")], axis=-1
        )
        g = jax.nn.relu(nn.Dense(128)(g))
        return nn.Dense(self.num_classes)(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    images, labels = load_digits_sparse()
    n_train = int(len(images) * 0.9)
    model = SparseDigitNet()
    tx = optax.adamw(optax.cosine_decay_schedule(3e-3, args.steps))

    rng = np.random.default_rng(0)
    vox0 = to_voxels(images, rng.integers(0, n_train, args.batch))
    params = model.init(jax.random.PRNGKey(0), vox0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, vox, y):
        def loss_fn(p):
            logits = model.apply(p, vox)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, (logits.argmax(-1) == y).mean()

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.perf_counter()
    for i in range(args.steps):
        idx = rng.integers(0, n_train, args.batch)
        vox = to_voxels(images, idx)
        y = jnp.asarray(labels[idx], jnp.int32)
        params, opt_state, loss, acc = step(params, opt_state, vox, y)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i:4d} loss {float(loss):.4f} acc {float(acc):.3f} "
                  f"({time.perf_counter()-t0:.1f}s)")

    # eval (pad the last batch but only count each held-out digit once)
    idx = np.arange(n_train, len(images))
    correct, total = 0, 0
    for s in range(0, len(idx), args.batch):
        sl = idx[s:s + args.batch]
        real = len(sl)
        if real < args.batch:
            sl = np.concatenate([sl, idx[: args.batch - real]])
        vox = to_voxels(images, sl)
        logits = model.apply(params, vox)
        pred = np.asarray(logits.argmax(-1))[:real]
        correct += int((pred == labels[sl[:real]]).sum())
        total += real
    print(f"val acc {correct / total:.3f} ({correct}/{total})")


if __name__ == "__main__":
    main()
