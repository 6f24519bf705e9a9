"""'auto' algo resolution: cache winners drive dispatch; heuristics and env
pins behave as documented (the round-1 gap: winners were recorded but never
consulted — VERDICT/ADVICE round 1)."""

import numpy as np
import jax.numpy as jnp

from warpconvnet_tpu import constants
from warpconvnet_tpu.nn.functional.autotune import record_winner
from warpconvnet_tpu.nn.functional.sparse_conv import _resolve_algo_spec
from warpconvnet_tpu.utils.benchmark_cache import (
    NS_FORWARD,
    SparseConvConfig,
    get_benchmark_cache,
)


def _cfg(n=4096, c_in=32, c_out=64, k=27):
    return SparseConvConfig.from_shapes(n, n, c_in, c_out, k, jnp.float32)


def test_env_pins_override():
    cfg = _cfg()
    assert _resolve_algo_spec("explicit", NS_FORWARD, cfg, True, 2, 3) == (
        "explicit",
    )
    assert _resolve_algo_spec("implicit_pallas", NS_FORWARD, cfg, True, 2, 3) == (
        "igemm", 256, 2, 3, 1, -1, 0,
    )
    # Wide windows fall back to explicit even when pinned.
    assert _resolve_algo_spec(
        "implicit_pallas", NS_FORWARD, cfg, True, 16, 3
    ) == ("explicit",)


def test_auto_consults_cache_winner():
    cfg = _cfg(c_in=48, c_out=48)
    record_winner(
        NS_FORWARD, cfg, {"algo": "igemm", "tile_m": 512, "window": 1, "ms": 1.0}
    )
    spec = _resolve_algo_spec("auto", NS_FORWARD, cfg, True, 2, 3)
    assert spec == ("igemm", 512, 1, 3, 1, -1, 0), spec

    record_winner(NS_FORWARD, cfg, {"algo": "explicit", "ms": 1.0})
    spec = _resolve_algo_spec("auto", NS_FORWARD, cfg, True, 2, 3)
    assert spec == ("explicit",), spec
    # Clean up the in-memory cache entry so other tests see a miss.
    get_benchmark_cache().put(NS_FORWARD, cfg.key(), None)


def test_auto_heuristic_requires_sorted():
    cfg = _cfg(c_in=56, c_out=56)
    # Unsorted inputs can't satisfy the monotone pair-table contract.
    spec = _resolve_algo_spec("auto", NS_FORWARD, cfg, False, 2, 3)
    assert spec == ("explicit",), spec
