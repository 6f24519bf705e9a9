"""Decompose the MinkUNet18 train-step time on the real chip:
(a) coordinate plan only (all map builds, all levels)
(b) forward only
(c) forward+backward+update (the bench step)
"""

import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import optax

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.mink_unet import MinkUNet18
from warpconvnet_tpu.nn.functional.sparse_conv import (
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.parallel import create_train_state, make_segmentation_train_step

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

if os.environ.get("WCT_BENCH_ALGO", "implicit_pallas") == "implicit_pallas":
    constants.WCT_FWD_ALGO_MODE = "implicit_pallas"
    constants.WCT_DGRAD_ALGO_MODE = "implicit_pallas"
    constants.WCT_WGRAD_ALGO_MODE = "implicit_pallas"
    constants.WCT_ASSUME_LEX_SORTED = True
    constants.WCT_KERNEL_MAP_PROBE = True
constants.set_compute_dtype("bfloat16")


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:35s} {dt:9.1f} ms   (first {first:.0f}s)", flush=True)


def main():
    b, n_cap, num_classes = 2, 1 << 17, 20
    rng = np.random.default_rng(0)
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, 3), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = rng.standard_normal((len(c), 3)).astype(np.float32)
    vox = Voxels.create(coords, feats, nv).lex_sort()
    labels = jnp.asarray(rng.integers(0, num_classes, (b, n_cap)).astype(np.int32))
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def plan_only(v):
        acc = jnp.int32(0)
        cur = v
        caps = [max(n_cap // (2 ** i), 128) for i in range(5)]
        for lvl in range(4):
            # submanifold 3^3 map at this level
            _, _, t_sub, _ = generate_output_coords_and_kernel_map(cur, 3, 1)
            acc = acc + t_sub.table.sum() + t_sub.rev.sum()
            # strided 2^3 map down to the next level
            oc, onv, t_dn, ts = generate_output_coords_and_kernel_map(
                cur, 2, 2, out_capacity=caps[lvl + 1]
            )
            acc = acc + t_dn.table.sum() + t_dn.rev.sum()
            cur = Voxels(
                coords=oc,
                features=jnp.zeros(oc.shape[:2] + (1,), jnp.float32),
                num_valid=onv,
                voxel_size=cur.voxel_size,
                tensor_stride=ts,
                # Strided outputs come sorted; without this flag an `auto`
                # run silently measures the argsort+bucketed path at every
                # level below L0 (269 ms/level at L0 scale vs 25 ms probe) —
                # the model path sets it (sparse_conv.py out Voxels), so the
                # step never pays that.
                lex_sorted=True,
            )
        _, _, t_sub, _ = generate_output_coords_and_kernel_map(cur, 3, 1)
        acc = acc + t_sub.table.sum()
        return acc

    timeit("plan only (9 maps, 5 levels)", plan_only, vox)

    model = MinkUNet18(in_channels=3, out_channels=num_classes)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, vox, train=False)

    @jax.jit
    def fwd_only(params, batch_stats, v):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, v, train=False
        )
        return out.features.astype(jnp.float32).sum()

    timeit("forward only", fwd_only, state.params, state.batch_stats, vox)

    step = make_segmentation_train_step(model, tx, num_classes)

    def full(state, v, l):
        s, m = step(state, v, l)
        return m["loss"]

    timeit("full train step", full, state, vox, labels)


if __name__ == "__main__":
    main()
