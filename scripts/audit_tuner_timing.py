"""Diagnose the tuned-winner ms skew (VERDICT r4 weak #4).

data/benchmark_cache.json records e.g. 350 ms "explicit" for
n17_ci128_co128_k27 where scripts/perf_v5.py measured the same igemm fwd at
8.54 ms. This script times ONE config (the n17 c128 k27 fwd) three ways on
the chip to find where the overhead lives:

  A. perf_v5 style — jitted fn(table, plan passed as ARGS), 10 independent
     dispatches, one fetch.
  B. tuner style   — jax.jit(lambda f, w: op(..captured table/plan..)),
     exactly autotune._time_callable (warmup 1, iters 5).
  C. device-true   — one program that lax.scans the op S times with an
     input perturbation per step (defeats CSE), one dispatch; ms = total/S.

Usage: python scripts/audit_tuner_timing.py
"""

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
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    make_plan,
    x_group_of,
)
from warpconvnet_tpu.nn.functional.autotune import _time_callable
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


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
    zg = x_group_of(np.asarray(bpt.offsets))
    print(f"zg={zg}", flush=True)

    c_in = c_out = 128
    x = jnp.asarray(
        rng.standard_normal((b, n_cap, c_in)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.standard_normal((27, c_in, c_out)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)

    kw = dict(tile_m=256, window_factor=1.5, zg=zg, s=4)
    plan = make_plan(tbl, n_cap, tile_m=256, window_factor=1.5, zg=zg,
                     pack=1, s=4, identity_k=13)

    # --- A: perf_v5 style (args-passed) -------------------------------
    @jax.jit
    def fwd_args(x, w, tbl, plan):
        return implicit_gemm_fwd(x, w, tbl, plan, identity_k=13, **kw)

    out = fwd_args(x, w, tbl, plan)
    _ = np.asarray(jax.device_get(out)).ravel()[:1]
    for iters in (5, 10, 20):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_args(x, w, tbl, plan)
        _ = np.asarray(jax.device_get(out)).ravel()[:1]
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"A args-style iters={iters:3d}: {ms:8.2f} ms", flush=True)

    # --- B: tuner style (closure capture + _time_callable) ------------
    g = jax.jit(
        lambda f, ww: implicit_gemm_fwd(f, ww, tbl, plan, identity_k=13, **kw)
    )
    fn = lambda f=x, ww=w: g(f, ww)
    ms_b = _time_callable(fn, iters=5)
    print(f"B tuner-style iters=5   : {ms_b:8.2f} ms", flush=True)
    ms_b2 = _time_callable(fn, iters=20)
    print(f"B tuner-style iters=20  : {ms_b2:8.2f} ms", flush=True)

    # --- C: device-true (scan inside one program) ----------------------
    S = 20

    @jax.jit
    def fwd_scan(x, w, tbl, plan):
        def body(carry, _):
            xp = x + carry * jnp.bfloat16(1e-8)  # defeat CSE/hoisting
            o = implicit_gemm_fwd(xp, w, tbl, plan, identity_k=13, **kw)
            return o[0, 0, 0].astype(jnp.bfloat16), ()

        c, _ = lax.scan(body, jnp.bfloat16(0.0), None, length=S)
        return c

    out = fwd_scan(x, w, tbl, plan)
    _ = float(jax.device_get(out))
    t0 = time.perf_counter()
    out = fwd_scan(x, w, tbl, plan)
    _ = float(jax.device_get(out))
    ms_c = (time.perf_counter() - t0) / S * 1e3
    print(f"C scan-device S={S}      : {ms_c:8.2f} ms", flush=True)

    # --- D: dispatch overhead floor (trivial program) -------------------
    @jax.jit
    def tiny(a):
        return a + 1.0

    a = jnp.zeros((8,), jnp.float32)
    _ = np.asarray(jax.device_get(tiny(a)))
    for iters in (5, 20):
        t0 = time.perf_counter()
        for _ in range(iters):
            a = tiny(a)
        _ = np.asarray(jax.device_get(a)).ravel()[:1]
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"D tiny-dispatch iters={iters:3d}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
