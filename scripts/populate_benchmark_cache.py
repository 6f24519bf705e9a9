"""Pre-tune the sparse-conv autotune cache for a sweep of shapes (reference
``scripts/populate_benchmark_cache.py`` — presets + sweep, rank-0 writes).

Usage: python scripts/populate_benchmark_cache.py [--preset scannet|modelnet]
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

PRESETS = {
    # (batch, n_points, c_in, c_out, kernel_volume)
    "scannet": [
        (2, 131072, 32, 32, 27),
        (2, 131072, 32, 64, 8),
        (2, 65536, 64, 64, 27),
        (2, 32768, 128, 128, 27),
        (2, 16384, 256, 256, 27),
    ],
    "modelnet": [
        (8, 2048, 32, 64, 27),
        (8, 1024, 64, 128, 27),
        (8, 512, 128, 256, 27),
    ],
    "smoke": [(2, 4096, 16, 16, 27)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="smoke", choices=sorted(PRESETS))
    args = ap.parse_args()

    from warpconvnet_tpu.nn.functional.autotune import pre_autotune
    from warpconvnet_tpu.utils.benchmark_cache import get_benchmark_cache

    pre_autotune(PRESETS[args.preset])
    cache = get_benchmark_cache()
    for ns, entries in cache._data.items():  # noqa: SLF001 (inspection script)
        print(f"[{ns}]")
        for k, v in entries.items():
            print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
