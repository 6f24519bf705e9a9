"""Round-2 step decomposition at bench shapes: batched plan phase, igemm
kernel (plan prebuilt) across tile configs, and whole-model fwd vs train step.
Run on the real chip."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.set_compute_dtype("bfloat16")
for _a in ("WCT_FWD_ALGO_MODE", "WCT_DGRAD_ALGO_MODE", "WCT_WGRAD_ALGO_MODE"):
    setattr(constants, _a, "implicit_pallas")
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    build_batched_pair_table,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
    vox = Voxels.create(
        coords, np.zeros((b, n_cap, 3), np.float32), nv
    ).lex_sort()
    print("devices:", jax.devices(), flush=True)

    offsets = kernel_offsets(3)

    # --- plan phase ---------------------------------------------------------
    @jax.jit
    def submap(v):
        t = build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offsets,
            self_map=True, assume_sorted=True,
        )
        return t.table.sum()

    timeit("batched submanifold 3^3 map (B=2, probe)", submap, vox)

    @jax.jit
    def table_of(v):
        return build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offsets,
            self_map=True, assume_sorted=True,
        )

    bpt = table_of(vox)
    tbl = jax.device_get(bpt.table)
    tbl = jnp.asarray(tbl)

    @jax.jit
    def planb(t):
        p = make_plan(t, n_cap, tile_m=256, window_factor=2)
        return p.starts.sum() + p.local.sum()

    timeit("make_plan (flatten + windows) B=2x27x131k", planb, tbl)

    # --- GEMM with prebuilt plans -------------------------------------------
    cin = cout = 128
    x = jnp.asarray(rng.standard_normal((b, n_cap, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, n_cap, cout)), jnp.bfloat16)

    for tm, wf in [(256, 2), (256, 1), (512, 2), (512, 1), (1024, 1)]:
        plan = jax.jit(
            lambda t: make_plan(t, n_cap, tile_m=tm, window_factor=wf)
        )(tbl)
        timeit(
            f"igemm fwd C128 tile{tm} wf{wf} (plan prebuilt)",
            jax.jit(lambda x, w, t, p: implicit_gemm_fwd(
                x, w, t, p, tile_m=tm, window_factor=wf).sum()),
            x, w, tbl, plan,
        )
    plan = jax.jit(
        lambda t: make_plan(t, n_cap, tile_m=256, window_factor=2)
    )(tbl)
    timeit(
        "igemm wgrad C128 tile256 wf2 (plan prebuilt)",
        jax.jit(lambda x, g, t, p: implicit_gemm_wgrad(
            x, g, t, p, tile_m=256, window_factor=2).sum()),
        x, g, tbl, plan,
    )

    # C=32 (stem-level channels)
    x32 = jnp.asarray(rng.standard_normal((b, n_cap, 32)), jnp.bfloat16)
    w32 = jnp.asarray(rng.standard_normal((27, 32, 32)) * 0.05, jnp.bfloat16)
    timeit(
        "igemm fwd C32 tile256 wf2 (plan prebuilt)",
        jax.jit(lambda x, w, t, p: implicit_gemm_fwd(
            x, w, t, p, tile_m=256, window_factor=2).sum()),
        x32, w32, tbl, plan,
    )

    # --- whole model --------------------------------------------------------
    import optax
    from warpconvnet_tpu.models.mink_unet import MinkUNet18
    from warpconvnet_tpu.parallel import (
        create_train_state, make_segmentation_train_step,
    )

    model = MinkUNet18(in_channels=3, out_channels=20)
    state = create_train_state(model, optax.adam(1e-3), vox, train=False)
    labels = jnp.zeros((b, n_cap), jnp.int32)

    @jax.jit
    def fwd_only(params, batch_stats, v):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, v, train=False
        )
        return out.features.astype(jnp.float32).sum()

    timeit("MinkUNet18 fwd only (B=2, 230k pts)", fwd_only,
           state.params, state.batch_stats, vox, iters=5)

    step = make_segmentation_train_step(model, optax.adam(1e-3), 20)

    def train_step(state, v, y):
        return step(state, v, y)

    s2, m = train_step(state, vox, labels)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        s2, m = train_step(s2, vox, labels)
    _ = float(m["loss"])
    print(f"{'train step (fwd+bwd+adam)':58s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
