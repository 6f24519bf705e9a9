"""ConvNeXt-block depthwise benchmark — the end-to-end number for the Pallas
depthwise FMA family (VERDICT r4 weak #5: the 806-LoC kernel had no measured
entry anywhere; MinkUNet has no depthwise).

Times a SparseConvNeXtBlock-shaped fwd+bwd (depthwise k^3 conv + LN +
pointwise MLP + layer scale) on the bench scene, explicit vs tuned-auto
depthwise backends, with device-true in-program scan timing (ms = slope
between two trip counts, cancelling the tunnel's per-dispatch RPC overhead).

Usage: python scripts/perf_convnext.py [channels=96] [kernel=7]
Prints `MS\t<ms>` per variant (reference bar: bench scripts print per-step MS
unconditionally, ``scripts/bench_unet_gb300.py:97``).
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.set_compute_dtype("bfloat16")
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.blocks import SparseConvNeXtBlock
from warpconvnet_tpu.ops.keys import PAD_COORD


def scan_ms(fn, args, n_lo=2, n_hi=10):
    """Device-true ms/call: dynamic-trip-count fori_loop inside one program,
    slope between two trip counts (same method as autotune._make_scan_timer)."""

    def run_impl(n, *a):
        def body(_, carry):
            aa = list(a)
            aa[0] = jax.tree.map(
                lambda t: t + (carry * 1e-12).astype(t.dtype)
                if jnp.issubdtype(t.dtype, jnp.floating) else t,
                aa[0],
            )
            out = fn(*aa)
            return jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    runner = jax.jit(run_impl)
    _ = float(jax.device_get(runner(jnp.int32(n_lo), *args)))

    def t(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(jax.device_get(runner(jnp.int32(n), *args)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_hi) - t(n_lo)) / (n_hi - n_lo) * 1e3


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    ks = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        cc = make_surface_scene(rng, n_cap)
        nv[i] = len(cc)
        coords[i, : len(cc)] = cc
        feats[i, : len(cc)] = rng.standard_normal((len(cc), c)) * 0.1
    vox = Voxels.create(coords, feats, nv).lex_sort()
    vox = vox.replace(features=vox.features.astype(jnp.bfloat16))
    print(f"devices: {jax.devices()}  c={c} k={ks}^3 "
          f"({int(nv.sum())} voxels)", flush=True)

    model = SparseConvNeXtBlock(channels=c, kernel_size=ks)
    params = model.init(jax.random.PRNGKey(0), vox)

    def loss_fn(params, v):
        out = model.apply(params, v)
        return jnp.sum(out.features.astype(jnp.float32) ** 2)

    def train(params, v):
        loss, g = jax.value_and_grad(loss_fn)(params, v)
        return loss, g

    for mode in ("explicit", "auto"):
        constants.WCT_DEPTH_ALGO_MODE = mode
        ms_f = scan_ms(lambda p, v: loss_fn(p, v), (params, vox))
        ms_t = scan_ms(lambda p, v: train(p, v), (params, vox))
        print(f"{mode:9s} fwd        MS\t{ms_f:.2f}", flush=True)
        print(f"{mode:9s} fwd+bwd    MS\t{ms_t:.2f}", flush=True)


if __name__ == "__main__":
    main()
