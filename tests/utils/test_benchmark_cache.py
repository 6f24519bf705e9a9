"""Benchmark cache + autotuner behavior tests (reference
tests/utils/test_generic_benchmark_cache.py, test_autotune_numeric_guard.py,
test_autotune_pinned_algo_cache.py)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.utils.benchmark_cache import (

    CACHE_VERSION,
    GenericBenchmarkCache,
    NS_FORWARD,
    SparseConvConfig,
    log2_bin,
)

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)


def test_roundtrip(tmp_path):
    c = GenericBenchmarkCache(cache_dir=str(tmp_path))
    cfg = SparseConvConfig.from_shapes(100_000, 100_000, 32, 64, 27, "float32")
    c.put(NS_FORWARD, cfg.key(), {"algo": "igemm", "tile_m": 512, "ms": 1.5})
    assert c.save()

    c2 = GenericBenchmarkCache(cache_dir=str(tmp_path))
    rec = c2.get(NS_FORWARD, cfg.key())
    assert rec == {"algo": "igemm", "tile_m": 512, "ms": 1.5}


def test_shape_binning_collapses_small_and_similar():
    a = SparseConvConfig.from_shapes(500, 600, 32, 64, 27, "float32")
    b = SparseConvConfig.from_shapes(900, 1000, 32, 64, 27, "float32")
    assert a.key() == b.key()  # sub-1024 sizes share a bin
    c = SparseConvConfig.from_shapes(100_000, 100_000, 32, 64, 27, "float32")
    d = SparseConvConfig.from_shapes(120_000, 120_000, 32, 64, 27, "float32")
    assert c.key() == d.key()  # same log2 bin
    e = SparseConvConfig.from_shapes(300_000, 300_000, 32, 64, 27, "float32")
    assert c.key() != e.key()


def test_merge_keeps_faster_entry(tmp_path):
    c1 = GenericBenchmarkCache(cache_dir=str(tmp_path))
    c1.put("ns", "k", {"algo": "a", "ms": 5.0})
    c1.save()
    c2 = GenericBenchmarkCache(cache_dir=str(tmp_path))
    c2.put("ns", "k", {"algo": "b", "ms": 9.0})  # slower
    c2.save()
    c3 = GenericBenchmarkCache(cache_dir=str(tmp_path))
    assert c3.get("ns", "k")["algo"] == "a"


def test_corrupt_file_fails_open(tmp_path):
    p = tmp_path / "benchmark_cache.json"
    p.write_text("{not json")
    c = GenericBenchmarkCache(cache_dir=str(tmp_path))
    assert c.get("ns", "k") is None
    c.put("ns", "k", {"ms": 1.0})
    assert c.save()


def test_version_mismatch_discards(tmp_path):
    p = tmp_path / "benchmark_cache.json"
    p.write_text(json.dumps({"version": "0.0", "namespaces": {"ns": {"k": 1}}}))
    c = GenericBenchmarkCache(cache_dir=str(tmp_path))
    assert c.get("ns", "k") is None


def test_version_migration_chain(tmp_path):
    """Registered migrations carry stale-version entries forward instead of
    discarding them (reference benchmark_cache.py:364)."""
    from warpconvnet_tpu.utils import benchmark_cache as bc

    def up_09(ns):  # 0.9 -> 1.0: rename namespace old_ns -> ns
        return {"ns" if k == "old_ns" else k: v for k, v in ns.items()}

    bc.register_migration("0.9", CACHE_VERSION, up_09)
    try:
        p = tmp_path / "benchmark_cache.json"
        p.write_text(
            json.dumps({"version": "0.9", "namespaces": {"old_ns": {"k": {"ms": 2.0}}}})
        )
        c = GenericBenchmarkCache(cache_dir=str(tmp_path))
        assert c.get("ns", "k") == {"ms": 2.0}
        # Migration marks the cache dirty: a save rewrites at CACHE_VERSION.
        assert c.save()
        assert json.loads(p.read_text())["version"] == CACHE_VERSION
    finally:
        bc._MIGRATIONS.pop("0.9", None)


def test_background_saver_flushes(tmp_path):
    c = GenericBenchmarkCache(cache_dir=str(tmp_path))
    c.start_background_saver(interval_s=0.05)
    c.put("ns", "k", {"ms": 1.0})
    import time

    deadline = time.monotonic() + 5.0
    p = tmp_path / "benchmark_cache.json"
    while not p.exists() and time.monotonic() < deadline:
        time.sleep(0.02)
    c.stop_background_saver()
    assert p.exists()
    assert GenericBenchmarkCache(cache_dir=str(tmp_path)).get("ns", "k") == {"ms": 1.0}


def test_exit_hooks_installed():
    """get_benchmark_cache installs the SIGTERM/atexit flush exactly once
    (reference benchmark_cache.py:979)."""
    import signal

    from warpconvnet_tpu.utils import benchmark_cache as bc

    bc.get_benchmark_cache()
    assert bc._exit_hooks_installed
    handler = signal.getsignal(signal.SIGTERM)
    assert callable(handler) and handler not in (signal.SIG_DFL, signal.SIG_IGN)


def test_autotune_numeric_guard_disqualifies_wrong_backend(tmp_path, monkeypatch):
    """A candidate producing wrong numbers must lose even if 'fast'
    (reference autotune numeric disqualification, autotune.py:668-821)."""
    from warpconvnet_tpu.nn.functional.autotune import benchmark_and_pick

    x = jnp.arange(64.0).reshape(8, 8)

    def build_ok(x):
        return (lambda x: x * 2.0), (x,)

    def build_wrong(x):
        return (lambda x: x * 2.5), (x,)  # numerically wrong

    rec = benchmark_and_pick(
        {"explicit": build_ok, "fastwrong": build_wrong},
        [{"algo": "explicit"}, {"algo": "fastwrong"}],
        (x,),
        iters=2,
    )
    assert rec["algo"] == "explicit"


def test_autotune_fail_open_when_all_disqualified():
    from warpconvnet_tpu.nn.functional.autotune import benchmark_and_pick

    x = jnp.ones((4, 4))

    def build_ok(x):
        return (lambda x: x), (x,)

    def build_crash(x):
        def f(x):
            raise RuntimeError("kernel exploded")

        return f, (x,)

    rec = benchmark_and_pick(
        {"explicit": build_ok, "crash": build_crash},
        [{"algo": "crash"}],
        (x,),
        iters=2,
    )
    assert rec["algo"] == "explicit"  # fail-open to reference


def test_autotune_tiebreak_retimes_near_ties(monkeypatch):
    """Candidates within the tie margin are re-timed at higher iteration
    count; the re-timed ordering wins (reference autotune.py:415)."""
    from warpconvnet_tpu.nn.functional import autotune as at

    x = jnp.ones((4, 4))
    calls = {"n": 0}
    # First pass: a=5.00, b=5.10 (within 1.15x). Retime: a=4.9, b=3.0.
    schedule = [5.00, 5.10, 4.90, 3.00]

    def fake_make_timer(fn, args):
        def timer(n_lo=2, n_hi=12, repeats=2):
            ms = schedule[calls["n"]]
            calls["n"] += 1
            return ms

        return timer

    monkeypatch.setattr(at, "_make_scan_timer", fake_make_timer)
    rec = at.benchmark_and_pick(
        {"a": lambda x: ((lambda x: x), (x,)),
         "b": lambda x: ((lambda x: x * 1.0), (x,))},
        [{"algo": "a"}, {"algo": "b"}],
        (x,),
        reference_algo="a",
        iters=2,
    )
    assert rec["algo"] == "b"
    assert rec["ms"] == 3.00
    assert calls["n"] == 4  # 2 first-pass + 2 tie-break timings


def test_autotune_no_tiebreak_outside_margin(monkeypatch):
    from warpconvnet_tpu.nn.functional import autotune as at

    x = jnp.ones((4, 4))
    calls = {"n": 0}
    schedule = [5.00, 9.00]  # b far outside the margin -> no retime

    def fake_make_timer(fn, args):
        def timer(n_lo=2, n_hi=12, repeats=2):
            ms = schedule[calls["n"]]
            calls["n"] += 1
            return ms

        return timer

    monkeypatch.setattr(at, "_make_scan_timer", fake_make_timer)
    rec = at.benchmark_and_pick(
        {"a": lambda x: ((lambda x: x), (x,)),
         "b": lambda x: ((lambda x: x * 1.0), (x,))},
        [{"algo": "a"}, {"algo": "b"}],
        (x,),
        reference_algo="a",
        iters=2,
    )
    assert rec["algo"] == "a" and calls["n"] == 2


def test_broadcast_winners_single_process_passthrough():
    from warpconvnet_tpu.nn.functional.autotune import _broadcast_winners

    res = {"ns": {"algo": "igemm", "ms": 1.0}}
    assert _broadcast_winners(res) is res


def test_autotune_sparse_conv_end_to_end(tmp_path, monkeypatch):
    import warpconvnet_tpu.utils.benchmark_cache as bc

    monkeypatch.setattr(bc, "_global_cache", GenericBenchmarkCache(cache_dir=str(tmp_path)))
    from warpconvnet_tpu.nn.functional.autotune import autotune_sparse_conv

    rng = np.random.default_rng(0)
    b, n, c = 2, 1024, 16
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((27, c, c)), jnp.float32)
    raw = rng.integers(-n // 4, n, size=(b, 27, n))
    raw.sort(axis=-1)
    t = jnp.asarray(np.where(raw < 0, -1, np.minimum(raw, n - 1)), np.int32)
    res = autotune_sparse_conv(f, w, t, t, save=True)
    assert NS_FORWARD in res
    assert res[NS_FORWARD]["algo"] == "explicit"  # CPU: only candidate
    assert os.path.exists(tmp_path / "benchmark_cache.json")
