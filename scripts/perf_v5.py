"""igemm "v5" candidate experiments on the real chip: dx-major offset
grouping.

v4 z-groups the zg=3 offsets sharing (dx, dy) under one window DMA. In lex
(x, y, z) order a dy=+-1 step moves the matching row by only ~(points per
(x, y) column) = O(1) on sparse scenes, so the 9 offsets sharing dx alone
also fit one window (zg=9, G=3): 3x fewer dependent op chains per sub-tile
at identical one-hot FLOPs — the same op-count lever that made v4 1.5x
faster than v3 (docs/user_guide/performance.md "op-count-bound").

Variants (production implicit_gemm_fwd/wgrad, plans prebuilt):
  fwd/wgrad at zg in {3, 9, 27} x tile_m {256, 512} x wf {1.25, 1.5, 2.5}.
Plus a timing-only diagnostic that replaces the one-hot materialization
with a constant array (WRONG numerics — isolates the VPU compare/convert
cost from the MXU matmuls).
"""

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
from warpconvnet_tpu.kernels import implicit_gemm as ig
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {ms:8.2f} ms  (first {first:5.0f}s)", flush=True)
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
        coords, np.zeros((b, n_cap, 1), np.float32), nv
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
    pairs = int((np.asarray(tbl) >= 0).sum())
    print(f"table [B={b}, K=27, N={n_cap}], {pairs} pairs", flush=True)

    c_in = c_out = 128
    x = jnp.asarray(
        rng.standard_normal((b, n_cap, c_in)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g = jnp.asarray(
        rng.standard_normal((b, n_cap, c_out)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.standard_normal((27, c_in, c_out)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)

    ref = None
    configs = [
        ("v4 prod  zg=3  tm256 wf1.5 s4", dict(zg=3, tile_m=256, window_factor=1.5, s=4)),
        ("v5       zg=9  tm256 wf1.5 s4", dict(zg=9, tile_m=256, window_factor=1.5, s=4)),
        ("v5       zg=9  tm256 wf1.25 s4", dict(zg=9, tile_m=256, window_factor=1.25, s=4)),
        ("v5       zg=9  tm256 wf2.0 s4", dict(zg=9, tile_m=256, window_factor=2.0, s=4)),
        ("v5       zg=27 tm256 wf2.5 s4", dict(zg=27, tile_m=256, window_factor=2.5, s=4)),
        ("v5       zg=9  tm512 wf1.5 s2", dict(zg=9, tile_m=512, window_factor=1.5, s=2)),
        ("v5       zg=9  tm256 wf1.5 s8", dict(zg=9, tile_m=256, window_factor=1.5, s=8)),
        ("v5       zg=9  tm128 wf1.5 s8", dict(zg=9, tile_m=128, window_factor=1.5, s=8)),
        ("v5       zg=9  tm128 wf1.5 s16", dict(zg=9, tile_m=128, window_factor=1.5, s=16)),
    ]
    for name, kw in configs:
        plan = jax.jit(
            lambda t, kw=kw: make_plan(t, n_cap, identity_k=13, **kw)
        )(tbl)
        plan = jax.tree.map(jax.device_put, plan)
        ovf = int(jax.device_get(plan.of_count))
        # Reduce to a scalar INSIDE jit: fetching the [B, N, C] output drags
        # ~67 MB through the tunnel (~140 ms) and swamps the kernel time.
        fn = jax.jit(
            lambda x, w, t, p, kw=kw: implicit_gemm_fwd(
                x, w, t, p, identity_k=13, **kw
            ).astype(jnp.float32).sum()
        )
        try:
            ms = timeit(f"fwd  {name} (ovf {ovf})", fn, x, w, tbl, plan)
            out = float(jax.device_get(fn(x, w, tbl, plan)))
            if ref is None:
                ref = out
            else:
                err = abs(out - ref) / max(abs(ref), 1e-6)
                if err > 1e-2:
                    print(f"    NUMERIC MISMATCH sum rel err {err}")
        except Exception as e:
            print(f"fwd  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    # wgrad for the promising configs
    for name, kw in [configs[0], configs[1], configs[5]]:
        plan = jax.jit(
            lambda t, kw=kw: make_plan(t, n_cap, identity_k=13, **kw)
        )(tbl)
        plan = jax.tree.map(jax.device_put, plan)
        fn = jax.jit(
            lambda x, g, t, p, kw=kw: implicit_gemm_wgrad(
                x, g, t, p, identity_k=13, **kw
            ).astype(jnp.float32).sum()
        )
        try:
            timeit(f"wgrad {name}", fn, x, g, tbl, plan)
        except Exception as e:
            print(f"wgrad {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
