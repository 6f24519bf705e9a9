"""A/B the parity-map construction's effect on the FULL train step.

decomp runs showed fwd -92 ms but full only -17 ms with parity maps —
either the backward genuinely slowed (XLA scheduling of the new map
subgraph) or the old/new runs measured different mid-edit trees. This
script toggles WCT_PARITY_MAPS inside one process on identical data.
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.WCT_FWD_ALGO_MODE = "auto"
constants.WCT_DGRAD_ALGO_MODE = "auto"
constants.WCT_WGRAD_ALGO_MODE = "auto"
constants.set_compute_dtype("bfloat16")

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.mink_unet import MinkUNet18
from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.parallel import create_train_state, make_segmentation_train_step


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
    print(f"{name:45s} {dt:9.1f} ms   (first {first:.0f}s)", flush=True)


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

    model = MinkUNet18(in_channels=3, out_channels=num_classes)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, vox, train=False)

    for parity in (True, False):
        constants.WCT_PARITY_MAPS = parity
        tag = "parity" if parity else "probe "

        step = make_segmentation_train_step(model, tx, num_classes)

        def full(state, v, l, step=step):
            s, m = step(state, v, l)
            return m["loss"]

        timeit(f"[{tag}] full train step", full, state, vox, labels)

        @jax.jit
        def fwd_train(params, batch_stats, v):
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, v,
                train=True, mutable=["batch_stats"],
            )
            return out.features.astype(jnp.float32).sum()

        timeit(
            f"[{tag}] fwd only (train=True)", fwd_train,
            state.params, state.batch_stats, vox,
        )


if __name__ == "__main__":
    main()
