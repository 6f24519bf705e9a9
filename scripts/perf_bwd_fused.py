"""Fused-backward kernel A/B on the real chip (round 4).

Separate dgrad + wgrad passes each build the same per-offset one-hots and
stream overlapping windows; the fused kernel shares ONE one-hot gather
(channel-concatenated [x ‖ g] window) per (group, sub-tile) for both dx and
dw. Measures, at bench scale (2 x 131k rows, 27-offset self-map):

  1. separate dgrad + wgrad (production zg=9 tm256 wf1.5 s4) vs fused,
     at C128 and C32;
  2. narrow-C tile sweep: C32 with tile_m {256, 512} — the narrow kernel is
     latency-bound (C32 == C128 cost), so fewer/bigger grid units should
     win where C128 measured slower (perf guide round-3 notes).
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

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_bwd_fused,
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
    print(f"{name:58s} {ms:8.2f} ms  (first {first:5.0f}s)", flush=True)
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

    for c_ch in (128, 32):
        x = jnp.asarray(
            rng.standard_normal((b, n_cap, c_ch)).astype(np.float32)
        ).astype(jnp.bfloat16)
        g = jnp.asarray(
            rng.standard_normal((b, n_cap, c_ch)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((27, c_ch, c_ch)) * 0.05).astype(np.float32)
        ).astype(jnp.bfloat16)

        ref_dx = ref_dw = None
        tiles = [(256, 4)] if c_ch == 128 else [(256, 4), (512, 2), (512, 4)]
        for tm, s in tiles:
            kw = dict(zg=9, tile_m=tm, window_factor=1.5, s=s)
            plan = jax.jit(
                lambda t, kw=kw: make_plan(t, n_cap, identity_k=13, **kw)
            )(tbl)
            plan = jax.tree.map(jax.device_put, plan)
            ovf = int(jax.device_get(plan.of_count))
            tag = f"C{c_ch} tm{tm} s{s} (ovf {ovf})"

            fwd = jax.jit(
                lambda x, w, t, p, kw=kw: implicit_gemm_fwd(
                    x, w, t, p, identity_k=13, **kw
                ).astype(jnp.float32).sum()
            )
            dgrad = jax.jit(
                lambda gg, w, t, p, kw=kw: implicit_gemm_fwd(
                    gg, jnp.swapaxes(w, 1, 2), t, p, identity_k=13, **kw
                ).astype(jnp.float32).sum()
            )
            wgrad = jax.jit(
                lambda x, gg, t, p, kw=kw: implicit_gemm_wgrad(
                    x, gg, t, p, identity_k=13, **kw
                ).sum()
            )
            fused = jax.jit(
                lambda x, gg, w, t, p, kw=kw: [
                    o.astype(jnp.float32).sum()
                    for o in implicit_gemm_bwd_fused(
                        x, gg, w, t, p, identity_k=13, **kw
                    )
                ]
            )
            rev = tbl[:, ::-1, :]
            rplan = jax.tree.map(jax.device_put, plan.flip_k())
            try:
                ms_f = timeit(f"fwd    {tag}", fwd, x, w, tbl, plan)
                ms_d = timeit(f"dgrad  {tag}", dgrad, g, w, rev, rplan)
                ms_w = timeit(f"wgrad  {tag}", wgrad, x, g, tbl, plan)
                ms_fu = timeit(f"FUSED  {tag}", fused, x, g, w, tbl, plan)
                print(
                    f"    bwd separate {ms_d + ms_w:.2f} ms -> fused "
                    f"{ms_fu:.2f} ms ({(ms_d + ms_w) / ms_fu:.2f}x); "
                    f"train 3-pass {ms_f + ms_d + ms_w:.2f} -> "
                    f"{ms_f + ms_fu:.2f} ms",
                    flush=True,
                )
                # numeric cross-check fused vs separate
                dxs, dws = fused(x, g, w, tbl, plan)
                dx_sep = float(jax.device_get(dgrad(g, w, rev, rplan)))
                dw_sep = float(jax.device_get(wgrad(x, g, tbl, plan)))
                for nm, a, bb in (
                    ("dx", float(jax.device_get(dxs)), dx_sep),
                    ("dw", float(jax.device_get(dws)), dw_sep),
                ):
                    err = abs(a - bb) / max(abs(bb), 1e-6)
                    if err > 1e-2:
                        print(f"    NUMERIC MISMATCH {nm} rel err {err}")
            except Exception as e:
                print(
                    f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
