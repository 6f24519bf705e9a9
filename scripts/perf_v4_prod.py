"""Production batched ("v4") kernel timings on the real chip — fwd + wgrad
through implicit_gemm_fwd/wgrad at bench L0 shapes, C128 and C32, with and
without the identity fast path. Compare against the pre-batch loop kernel
(fwd C128 16.04 ms / wgrad 18.41 ms / C32 15.0 ms, scripts/perf_v3.py)."""

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
    print(f"{name:56s} {ms:8.2f} ms", flush=True)
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

    for cch in (128, 32):
        x = jnp.asarray(rng.standard_normal((b, n_cap, cch)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((27, cch, cch)) * 0.05, jnp.bfloat16
        )
        g = jnp.asarray(rng.standard_normal((b, n_cap, cch)), jnp.bfloat16)
        for tag, wf, s, ident in [
            ("wf1.5  s4 id13", 1.5, 4, 13),
            ("wf1.5  s4     ", 1.5, 4, None),
            ("wf1.25 s4 id13", 1.25, 4, 13),
        ]:
            plan = jax.jit(
                lambda t, wf=wf, s=s, ident=ident: make_plan(
                    t, n_cap, tile_m=256, window_factor=wf, zg=3, s=s,
                    identity_k=ident,
                )
            )(tbl)
            timeit(
                f"fwd   C{cch} {tag}",
                jax.jit(
                    lambda x, w, t, p, wf=wf, s=s, ident=ident:
                    implicit_gemm_fwd(
                        x, w, t, p, tile_m=256, window_factor=wf, zg=3, s=s,
                        identity_k=ident,
                    ).astype(jnp.float32).sum()
                ),
                x, w, tbl, plan,
            )
            if ident == 13 and wf == 1.5:
                timeit(
                    f"wgrad C{cch} {tag}",
                    jax.jit(
                        lambda x, g, t, p, wf=wf, s=s, ident=ident:
                        implicit_gemm_wgrad(
                            x, g, t, p, tile_m=256, window_factor=wf, zg=3,
                            s=s, identity_k=ident,
                        ).sum()
                    ),
                    x, g, tbl, plan,
                )


if __name__ == "__main__":
    main()
