"""Inspect / analyze the autotune benchmark cache (reference
``scripts/inspect_benchmark_cache.py`` / ``analyze_benchmark_cache.py``).

Usage: python scripts/inspect_benchmark_cache.py [--dir ~/.cache/warpconvnet_tpu]
"""

from __future__ import annotations

import argparse
import collections


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()

    from warpconvnet_tpu.utils.benchmark_cache import GenericBenchmarkCache

    cache = GenericBenchmarkCache(cache_dir=args.dir)
    cache._ensure_loaded()  # noqa: SLF001 (inspection script)
    if not cache._data:
        print(f"no cache at {cache.path}")
        return
    print(f"cache: {cache.path}")
    algo_wins = collections.Counter()
    for ns in sorted(cache._data):
        entries = cache._data[ns]
        print(f"\n[{ns}] {len(entries)} entries")
        for key in sorted(entries):
            rec = entries[key]
            ms = rec.get("ms") if isinstance(rec, dict) else None
            algo = rec.get("algo") if isinstance(rec, dict) else rec
            algo_wins[(ns, algo)] += 1
            extra = " ".join(
                f"{k}={v}" for k, v in rec.items() if k not in ("algo", "ms")
            ) if isinstance(rec, dict) else ""
            print(f"  {key}: {algo} ({ms if ms is None else f'{ms:.2f}'} ms) {extra}")
    print("\nwinner summary:")
    for (ns, algo), cnt in sorted(algo_wins.items()):
        print(f"  {ns}: {algo} x{cnt}")


if __name__ == "__main__":
    main()
