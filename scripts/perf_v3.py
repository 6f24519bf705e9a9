"""Round-3 kernel v3 micro-benchmark on the real chip: multi-tile grid
steps (s), identity-offset fast path, and tightened windows vs the round-2
default (tile256 wf1.5 s1), at C128 and C32, fwd + wgrad."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.set_compute_dtype("bfloat16")
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
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
    print(f"{name:64s} {ms:8.2f} ms", flush=True)
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

    @jax.jit
    def table_of(v):
        return build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offsets,
            self_map=True, assume_sorted=True,
        )

    bpt = table_of(vox)
    tbl = jnp.asarray(jax.device_get(bpt.table))

    cin = cout = 128
    x = jnp.asarray(rng.standard_normal((b, n_cap, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, n_cap, cout)), jnp.bfloat16)

    # (tag, tile_m, wf, s, ident, zg)
    cfgs = [
        ("r2 default  t256 wf1.5  s1      zg3", 256, 1.5, 1, None, 3),
        ("v3          t256 wf1.25 s4 id13 zg3", 256, 1.25, 4, 13, 3),
        ("v3 no-ident t256 wf1.25 s4      zg3", 256, 1.25, 4, None, 3),
        ("v3 s1       t256 wf1.25 s1 id13 zg3", 256, 1.25, 1, 13, 3),
        # t128 variants hit Mosaic "dynamic load with unaligned indices"
        # on the 128-lane local_ref slice — tile_m 256 is the floor.
    ]
    for tag, tm, wf, s, ident, zg in cfgs:
        plan = jax.jit(
            lambda t, tm=tm, wf=wf, s=s, ident=ident, zg=zg: make_plan(
                t, n_cap, tile_m=tm, window_factor=wf, zg=zg, s=s,
                identity_k=ident,
            )
        )(tbl)
        of = int(np.asarray(plan.of_count))
        timeit(
            f"fwd C128 {tag} (ovf {of})",
            jax.jit(
                lambda x, w, t, p, tm=tm, wf=wf, s=s, ident=ident, zg=zg:
                implicit_gemm_fwd(
                    x, w, t, p, tile_m=tm, window_factor=wf, zg=zg, s=s,
                    identity_k=ident,
                ).sum()
            ),
            x, w, tbl, plan,
        )

    # wgrad: r2 default vs v3
    for tag, tm, wf, s, ident, zg in [cfgs[0], cfgs[1]]:
        plan = jax.jit(
            lambda t, tm=tm, wf=wf, s=s, ident=ident, zg=zg: make_plan(
                t, n_cap, tile_m=tm, window_factor=wf, zg=zg, s=s,
                identity_k=ident,
            )
        )(tbl)
        timeit(
            f"wgrad C128 {tag}",
            jax.jit(
                lambda x, g, t, p, tm=tm, wf=wf, s=s, ident=ident, zg=zg:
                implicit_gemm_wgrad(
                    x, g, t, p, tile_m=tm, window_factor=wf, zg=zg, s=s,
                    identity_k=ident,
                ).sum()
            ),
            x, g, tbl, plan,
        )

    # C32 (packed path, no identity): per-step latency amortization via s
    x32 = jnp.asarray(rng.standard_normal((b, n_cap, 32)), jnp.bfloat16)
    w32 = jnp.asarray(rng.standard_normal((27, 32, 32)) * 0.05, jnp.bfloat16)
    for tag, tm, wf, s, zg in [
        ("r2 default t256 wf1.5  s1 zg3", 256, 1.5, 1, 3),
        ("v3         t256 wf1.25 s4 zg3", 256, 1.25, 4, 3),
    ]:
        plan = jax.jit(
            lambda t, tm=tm, wf=wf, s=s, zg=zg: make_plan(
                t, n_cap, tile_m=tm, window_factor=wf, zg=zg, pack=4, s=s,
            )
        )(tbl)
        timeit(
            f"fwd C32 {tag}",
            jax.jit(
                lambda x, w, t, p, tm=tm, wf=wf, s=s, zg=zg:
                implicit_gemm_fwd(
                    x, w, t, p, tile_m=tm, window_factor=wf, zg=zg, s=s,
                ).sum()
            ),
            x32, w32, tbl, plan,
        )


if __name__ == "__main__":
    main()
