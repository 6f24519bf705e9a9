"""ScanNet semantic segmentation example (reference
``examples/train/scannet.py``: voxelize colored points, MinkUNet backbone,
cross-entropy with ignore label, NonFiniteLossGuard, mIoU metric).

Backbone is swappable (--model minkunet18|minkunet34|spaceformer|ptv3), the
functional analog of the reference's Hydra ``model._target_`` swap. Runs on
synthetic rooms when no prepared ScanNet data is given.

Usage: python examples/train_scannet.py [--steps 20] [--model minkunet18]
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
import optax

from warpconvnet_tpu.dataset import (
    ChromaticJitter,
    Compose,
    RandomFlip,
    RandomRotation,
    RandomScale,
    ScanNetDataset,
    collate_voxels,
)
from warpconvnet_tpu.models.mink_unet import MinkUNet18, MinkUNet34
from warpconvnet_tpu.models.space_former import SpaCeFormer
from warpconvnet_tpu.utils.train_guard import NonFiniteLossGuard

IGNORE = -100


def build_model(name: str, num_classes: int):
    if name == "minkunet18":
        return MinkUNet18(3, num_classes)
    if name == "minkunet34":
        return MinkUNet34(3, num_classes)
    if name == "spaceformer":
        return SpaCeFormer(3, num_classes, dims=(32, 64, 128), depths=(2, 2, 2),
                           num_heads=(2, 4, 8), dec_depths=(1, 1))
    if name == "ptv3":
        from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3

        return PointTransformerV3(
            in_channels=3, out_channels=num_classes,
            enc_channels=(32, 64, 128, 256), enc_depths=(1, 1, 2, 2),
            enc_num_head=(2, 4, 8, 16), enc_patch_size=(128,) * 4,
            dec_channels=(32, 64, 128), dec_depths=(1, 1, 1),
            dec_num_head=(2, 4, 8), dec_patch_size=(128,) * 3,
        )
    raise ValueError(name)


def miou(logits: np.ndarray, labels: np.ndarray, num_classes: int) -> float:
    pred = logits.argmax(-1)
    valid = labels != IGNORE
    ious = []
    for c in range(num_classes):
        inter = ((pred == c) & (labels == c) & valid).sum()
        union = (((pred == c) | (labels == c)) & valid).sum()
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious)) if ious else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--model", default="minkunet18")
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--capacity", type=int, default=32768)
    ap.add_argument("--root", default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    aug = Compose([
        RandomRotation(), RandomScale(), RandomFlip(), ChromaticJitter(),
    ])
    ds = ScanNetDataset(root=args.root, transform=aug, synthetic_points=30_000)
    print(f"dataset: {len(ds)} scenes (synthetic={ds.synthetic})")
    num_classes = ds.num_classes

    model = build_model(args.model, num_classes)
    tx = optax.adamw(1e-3)

    def make_batch(rng):
        idx = rng.integers(0, len(ds), args.batch)
        samples = [ds[int(i)] for i in idx]
        vox, labels = collate_voxels(
            samples, voxel_size=args.voxel_size, capacity=args.capacity
        )
        if args.bf16:
            vox = vox.replace(features=vox.features.astype(jnp.bfloat16))
        return vox, jnp.asarray(labels)

    rng = np.random.default_rng(0)
    vox0, labels0 = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), vox0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, vox, labels):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                vox,
                train=True,
                mutable=["batch_stats"],
            )
            logits = out.features.astype(jnp.float32)
            mask = labels != IGNORE
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(labels, 0)
            )
            loss = jnp.where(mask, loss, 0).sum() / jnp.maximum(mask.sum(), 1)
            return loss, (updates.get("batch_stats", {}), logits)

        (loss, (bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, logits

    guard = NonFiniteLossGuard()
    t0 = time.perf_counter()
    for i in range(args.steps):
        vox, labels = make_batch(rng)
        params, batch_stats, opt_state, loss, logits = step(
            params, batch_stats, opt_state, vox, labels
        )
        if i % 5 == 0 or i == args.steps - 1:
            l = float(loss)
            guard.check(l)
            m = miou(np.asarray(logits), np.asarray(labels), num_classes)
            print(
                f"step {i:4d}  loss {l:.4f}  mIoU {m:.3f}  "
                f"({time.perf_counter() - t0:.1f}s)"
            )
    print("done")


if __name__ == "__main__":
    main()
