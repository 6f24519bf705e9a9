"""MaskFormer instance-segmentation training example (reference
``examples/train/maskformer.py``): synthetic rooms -> voxelize -> MaskFormer
-> Hungarian-matched set loss (class CE + mask BCE + dice).

The bipartite matching runs on the host with scipy's
linear_sum_assignment between jitted cost computation and jitted loss —
matching is data-dependent and tiny, so the host round-trip is the right
split (it is not part of the differentiated graph).

Usage: python examples/train_maskformer.py [--steps 10] [--cpu]
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
import optax

from warpconvnet_tpu.dataset import ScanNetInstanceDataset, collate_voxels
from warpconvnet_tpu.models.mask_former import MaskFormer

NO_OBJECT = -1


def instance_targets(labels: np.ndarray, max_instances: int):
    """Hungarian-matching targets from collated ``[B, N, 2]``
    (segment, instance) labels: one target per real instance id (class =
    its semantic label) plus one per "stuff" class (instance -1 but a valid
    segment — walls/floor), matching the reference's panoptic-style target
    construction for MaskFormer."""
    segment, instance = labels[..., 0], labels[..., 1]
    b, n = segment.shape
    cls = np.full((b, max_instances), NO_OBJECT, np.int64)
    masks = np.zeros((b, max_instances, n), np.float32)
    for i in range(b):
        j = 0
        for inst in np.unique(instance[i]):
            if inst < 0 or j >= max_instances:
                continue
            m = instance[i] == inst
            seg_ids, counts = np.unique(segment[i][m], return_counts=True)
            cls[i, j] = seg_ids[np.argmax(counts)]
            masks[i, j] = m
            j += 1
        stuff = (instance[i] < 0) & (segment[i] >= 0)
        for c in np.unique(segment[i][stuff]):
            if j >= max_instances:
                break
            cls[i, j] = c
            masks[i, j] = stuff & (segment[i] == c)
            j += 1
    return cls, masks


def hungarian_match(cost: np.ndarray, valid_targets: np.ndarray):
    from scipy.optimize import linear_sum_assignment

    b, q, t = cost.shape
    rows = np.zeros((b, t), np.int64)
    for i in range(b):
        nt = int(valid_targets[i].sum())
        if nt == 0:
            continue
        r, c = linear_sum_assignment(cost[i, :, :nt])
        rows[i, :nt][c] = r
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--capacity", type=int, default=8192)
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    ds = ScanNetInstanceDataset(
        label_set="scannet20", synthetic_size=50, synthetic_points=15_000
    )
    model = MaskFormer(
        in_channels=3, num_classes=ds.num_classes, num_queries=args.queries,
        dim=64, decoder_layers=2,
        backbone_planes=(16, 32, 64, 128, 128, 64, 32, 32),
    )
    tx = optax.adamw(1e-3)

    rng = np.random.default_rng(0)

    def make_batch():
        idx = rng.integers(0, len(ds), args.batch)
        samples = []
        for i in idx:
            s = ds[int(i)]
            # Pack (segment, instance) as a 2-column label so one collate
            # pass pads both alongside coords/colors.
            s["labels"] = np.stack([s["segment"], s["instance"]], -1)
            samples.append(s)
        vox, labels = collate_voxels(
            samples, voxel_size=0.08, capacity=args.capacity, label_ignore=-1
        )
        cls, masks = instance_targets(np.asarray(labels), args.queries)
        return vox, jnp.asarray(cls), jnp.asarray(masks)

    vox0, cls0, masks0 = make_batch()
    variables = model.init(jax.random.PRNGKey(0), vox0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def forward_costs(params, batch_stats, vox, tgt_cls, tgt_masks):
        (cls_logits, mask_logits), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, vox, train=True,
            mutable=["batch_stats"],
        )
        # cost[b, q, t] = -P(class_t | q) + mask BCE-ish distance
        probs = jax.nn.softmax(cls_logits, -1)
        safe_cls = jnp.maximum(tgt_cls, 0)
        cost_cls = -jnp.take_along_axis(
            probs, safe_cls[:, None, :], axis=2
        )
        pm = jax.nn.sigmoid(mask_logits)  # [B, Q, N]
        inter = jnp.einsum("bqn,btn->bqt", pm, tgt_masks)
        sums = pm.sum(-1)[:, :, None] + tgt_masks.sum(-1)[:, None, :]
        cost_dice = 1 - (2 * inter + 1) / (sums + 1)
        return cost_cls + cost_dice

    @jax.jit
    def step(params, batch_stats, opt_state, vox, tgt_cls, tgt_masks, assign):
        def loss_fn(p):
            (cls_logits, mask_logits), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, vox, train=True,
                mutable=["batch_stats"],
            )
            b, qn, _ = cls_logits.shape
            t = tgt_cls.shape[1]
            # Matched classification loss; unmatched queries -> no-object.
            matched_logits = jnp.take_along_axis(
                cls_logits, assign[:, :, None], axis=1
            )  # [B, T, C+1]
            tgt_valid = tgt_cls >= 0
            cls_loss = optax.softmax_cross_entropy_with_integer_labels(
                matched_logits, jnp.maximum(tgt_cls, 0)
            )
            cls_loss = jnp.where(tgt_valid, cls_loss, 0).sum() / jnp.maximum(
                tgt_valid.sum(), 1
            )
            # No-object loss on unmatched queries.
            matched_onehot = jnp.zeros((b, qn), bool)
            matched_onehot = jax.vmap(
                lambda m, a, v: m.at[jnp.where(v, a, qn)].set(True, mode="drop")
            )(matched_onehot, assign, tgt_valid)
            noobj = optax.softmax_cross_entropy_with_integer_labels(
                cls_logits, jnp.full((b, qn), model.num_classes)
            )
            noobj = jnp.where(~matched_onehot, noobj, 0).mean()
            # Mask losses on matched pairs.
            matched_masks = jnp.take_along_axis(
                mask_logits, assign[:, :, None], axis=1
            )  # [B, T, N]
            valid_pts = vox.valid_mask()[:, None, :]
            bce = optax.sigmoid_binary_cross_entropy(matched_masks, tgt_masks)
            bce = jnp.where(valid_pts & tgt_valid[..., None], bce, 0)
            bce = bce.sum() / jnp.maximum((valid_pts & tgt_valid[..., None]).sum(), 1)
            pm = jax.nn.sigmoid(matched_masks)
            inter = (pm * tgt_masks).sum(-1)
            dice = 1 - (2 * inter + 1) / (pm.sum(-1) + tgt_masks.sum(-1) + 1)
            dice = jnp.where(tgt_valid, dice, 0).sum() / jnp.maximum(
                tgt_valid.sum(), 1
            )
            total = cls_loss + 0.1 * noobj + bce + dice
            return total, upd.get("batch_stats", {})

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        vox, tgt_cls, tgt_masks = make_batch()
        cost = np.asarray(
            forward_costs(params, batch_stats, vox, tgt_cls, tgt_masks)
        )
        assign = jnp.asarray(
            hungarian_match(cost, np.asarray(tgt_cls) >= 0)
        )
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, vox, tgt_cls, tgt_masks, assign
        )
        print(f"step {i:3d}  loss {float(loss):.4f}  "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    print("done")


if __name__ == "__main__":
    main()
