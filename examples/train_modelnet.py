"""ModelNet40 classification example (reference
``examples/train/modelnet.py`` — ``UseAllConvNet:30``: PointConv feature
extraction -> voxelize -> SparseConv3d stack -> to_dense -> dense conv head).

Runs hermetically on synthetic ModelNet when no data is on disk. One jitted
train step; the input pipeline (dataset -> transforms -> collate) runs on the
host in parallel.

Usage: python examples/train_modelnet.py [--steps 50] [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

if "--cpu" in sys.argv:
    # Env vars alone don't override the TPU sitecustomize registration.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
import optax

from warpconvnet_tpu.dataset import (
    Compose,
    ModelNet40Dataset,
    RandomRotation,
    RandomScale,
    collate_points,
)
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.modules.point_conv import PointConv
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d
from warpconvnet_tpu.nn.functional.sparse_pool import global_pool
from warpconvnet_tpu.ops.search import RealSearchConfig
from warpconvnet_tpu.utils.train_guard import NonFiniteLossGuard


class UseAllConvNet(nn.Module):
    """PointConv stem -> voxelized SparseConv3d stages -> global pool -> MLP
    (the reference example's architecture, re-bucketed for static shapes)."""

    num_classes: int = 40
    voxel_size: float = 0.08
    dims: tuple = (32, 64, 128)

    @nn.compact
    def __call__(self, pts: Points, train: bool = True) -> jnp.ndarray:
        x = PointConv(
            pts.num_channels,
            self.dims[0],
            search=RealSearchConfig("knn", knn_k=16),
            reductions=("mean", "max"),
        )(pts)
        vox = x.to_voxels(self.voxel_size)
        for i, d in enumerate(self.dims[1:], 1):
            vox, _ = SparseConv3d(self.dims[i - 1], d, 3, name=f"conv{i}")(vox)
            vox = vox.replace_features(nn.LayerNorm()(vox.features))
            vox = vox.replace_features(jax.nn.relu(vox.features))
            vox, _ = SparseConv3d(d, d, 2, stride=2, name=f"down{i}")(vox)
        g = global_pool(vox, "max")
        g = jax.nn.relu(nn.Dense(128)(g))
        return nn.Dense(self.num_classes)(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--root", default=None, help="dir with modelnet40_*.npz")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    ds = ModelNet40Dataset(root=args.root, split="train", num_points=args.points)
    print(f"dataset: {len(ds)} samples (synthetic={ds.synthetic})")
    aug = Compose([RandomRotation(p=0.95), RandomScale()])

    model = UseAllConvNet()
    tx = optax.adamw(1e-3)

    def make_batch(rng):
        idx = rng.integers(0, len(ds), args.batch)
        samples = [aug(ds[int(i)], rng) for i in idx]
        pts, _ = collate_points(samples, capacity=args.points)
        labels = jnp.asarray([ds[int(i)]["label"] for i in idx], jnp.int32)
        return pts, labels

    rng = np.random.default_rng(0)
    pts0, labels0 = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), pts0, train=False)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pts, labels):
        def loss_fn(p):
            logits = model.apply(p, pts)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    guard = NonFiniteLossGuard()
    t0 = time.perf_counter()
    for i in range(args.steps):
        pts, labels = make_batch(rng)
        params, opt_state, loss, acc = step(params, opt_state, pts, labels)
        if i % 10 == 0 or i == args.steps - 1:
            l = float(loss)
            guard.check(l)
            print(
                f"step {i:4d}  loss {l:.4f}  acc {float(acc):.3f}  "
                f"({time.perf_counter() - t0:.1f}s)"
            )
    print("done")


if __name__ == "__main__":
    main()
