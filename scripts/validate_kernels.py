"""Numeric validation sweep of the Pallas implicit-GEMM kernel across tile
configs (reference ``scripts/validate_tiles_on_device.py`` /
``exhaustive_kernel_correctness.py``): every (tile_m, window_factor) config
is compared against the explicit backend on randomized sparse conv workloads.

Run with --interpret for hardware-free validation (Pallas interpreter — the
TPU analog of compute-sanitizer runs, SURVEY.md section 5), or on the real
chip for end-to-end confirmation.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax

if "--cpu" in sys.argv or "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def make_case(rng, n, c_in, c_out, k=27, grid=48):
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.functional.sparse_conv import (
        generate_output_coords_and_kernel_map,
    )
    from warpconvnet_tpu.ops.keys import PAD_COORD

    raw = rng.integers(0, grid, size=(n * 2, 3)).astype(np.int32)
    uniq = np.unique(raw, axis=0)[:n]
    coords = np.full((1, n, 3), PAD_COORD, np.int32)
    coords[0, : len(uniq)] = uniq
    feats = np.zeros((1, n, c_in), np.float32)
    feats[0, : len(uniq)] = rng.standard_normal((len(uniq), c_in))
    vox = Voxels.create(coords, feats, np.array([len(uniq)], np.int32))
    _, _, table, _ = generate_output_coords_and_kernel_map(vox, 3, 1)
    w = rng.standard_normal((k, c_in, c_out)).astype(np.float32) * 0.1
    return np.asarray(vox.features[0]), w, np.asarray(table.table[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", default="1024,4096")
    ap.add_argument("--channels", default="16,64")
    args = ap.parse_args()

    from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_raw
    from warpconvnet_tpu.nn.functional.sparse_conv import _fwd_impl

    rng = np.random.default_rng(0)
    failures = 0
    total = 0
    for n in (int(s) for s in args.sizes.split(",")):
        for c in (int(s) for s in args.channels.split(",")):
            x, w, table = make_case(rng, n, c, c)
            ref = np.asarray(
                _fwd_impl(
                    jnp.asarray(x)[None], jnp.asarray(w),
                    jnp.asarray(table)[None], jnp.float32,
                )[0]
            )
            for tile_m in (128, 256, 512):
                if tile_m > n:
                    continue
                for window in (2, 4):
                    total += 1
                    out = np.asarray(
                        implicit_gemm_raw(
                            jnp.asarray(x), jnp.asarray(w), jnp.asarray(table),
                            tile_m=tile_m, window_factor=window,
                            interpret=args.interpret,
                        )
                    )
                    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
                    status = "OK " if err < 1e-4 else "FAIL"
                    if err >= 1e-4:
                        failures += 1
                    print(
                        f"{status} n={n} c={c} tile_m={tile_m} window={window} "
                        f"rel_err={err:.2e}",
                        flush=True,
                    )
    print(f"{total - failures}/{total} configs passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
