"""Environment/config system (reference: ``warpconvnet/constants.py:107-290``).

Env vars use the ``WCT_`` prefix (WarpConvNet-TPU). Runtime setters mirror the
reference's ``set_fp16_accum`` API with bf16 semantics: on TPU the fast
accumulate path is bf16-multiply/fp32-accumulate (the MXU default), and the
opt-in "low precision accumulation" maps to bf16 accumulation in Pallas tiles.
"""

from __future__ import annotations

import os
from typing import List, Optional

_TRUE = {"1", "true", "yes", "on"}
_FALSE = {"0", "false", "no", "off"}


def _get_env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    lv = v.strip().lower()
    if lv in _TRUE:
        return True
    if lv in _FALSE:
        return False
    raise ValueError(f"{name}={v!r} is not a valid boolean")


def _get_env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v is None:
        return default
    return int(v)


def _get_env_string(name: str, default: str, valid: Optional[List[str]] = None) -> str:
    v = os.environ.get(name, default)
    if valid is not None and v not in valid:
        raise ValueError(f"{name}={v!r} not in {valid}")
    return v


def _get_env_string_list(name: str, default: str) -> List[str]:
    v = os.environ.get(name, default)
    v = v.strip()
    if v.startswith("[") and v.endswith("]"):
        v = v[1:-1]
    return [s.strip() for s in v.split(",") if s.strip()]


# --- Sparse-conv algorithm selection (reference WARPCONVNET_{FWD,...}_ALGO_MODE)
VALID_ALGOS = ["explicit", "gather_mm", "implicit_pallas"]
VALID_ALGO_MODES = VALID_ALGOS + ["auto"]

WCT_FWD_ALGO_MODE = _get_env_string("WCT_FWD_ALGO_MODE", "auto")
WCT_DGRAD_ALGO_MODE = _get_env_string("WCT_DGRAD_ALGO_MODE", "auto")
WCT_WGRAD_ALGO_MODE = _get_env_string("WCT_WGRAD_ALGO_MODE", "auto")

# Coordinate-engine fast paths: inputs guaranteed lex-sorted (skips the
# per-map sort + position->row gather) and the Pallas kernel-map probe
# (window-DMA search; needs monotone query tiles — implied by lex order).
# WCT_ASSUME_LEX_SORTED is a global override; per-tensor sortedness flows
# from Voxels.lex_sorted. WCT_KERNEL_MAP_PROBE is tri-state: unset (None)
# follows sortedness — sorted inputs get the fused probe automatically.
WCT_ASSUME_LEX_SORTED = _get_env_bool("WCT_ASSUME_LEX_SORTED", False)
_probe_env = os.environ.get("WCT_KERNEL_MAP_PROBE")
WCT_KERNEL_MAP_PROBE = (
    None if _probe_env is None else _get_env_bool("WCT_KERNEL_MAP_PROBE", False)
)

# Direct parity-partition kernel maps for even kernel==stride convs
# (ops/kernel_map.py parity_pair_tables_from_unique): the map is derived
# from the floor-div unique with no search at all. Escape hatch only —
# the construction is exact (pinned against the probe in
# tests/ops/test_parity_map.py).
WCT_PARITY_MAPS = _get_env_bool("WCT_PARITY_MAPS", True)

# Attention implementation: "flash" (Pallas segment-id flash kernel),
# "xla" (masked SDPA; materializes the score matrix), or None/"" = auto
# (flash on TPU for sequences >= 1024).
WCT_ATTENTION_IMPL = os.environ.get("WCT_ATTENTION_IMPL") or None

# Fused backward (one-pass dgrad+wgrad) for symmetric self-maps: shares
# window DMAs and one-hot gathers between the two directions
# (kernels/implicit_gemm.py implicit_gemm_bwd_fused). Escape hatch only —
# exact by construction (pinned vs the explicit backends in
# tests/kernels/test_igemm_fused_bwd.py).
WCT_FUSED_BWD = _get_env_bool("WCT_FUSED_BWD", True)

# Depthwise conv backend: "auto" consults the depth_fma_* cache namespaces
# (heuristic: Pallas FMA on sorted unit-stride maps), "explicit" pins the
# jnp gather-scan, "implicit_pallas" pins the Pallas FMA kernel
# (kernels/depthwise_fma.py — the TPU analog of the reference's
# implicit_fma_kernel.cu dispatch, sparse_conv_depth.py:657).
WCT_DEPTH_ALGO_MODE = _get_env_string("WCT_DEPTH_ALGO_MODE", "auto")

# Autotune behavior
WCT_AUTOTUNE = _get_env_bool("WCT_AUTOTUNE", True)
WCT_AUTOTUNE_NUMERIC_CHECK = _get_env_bool("WCT_AUTOTUNE_NUMERIC_CHECK", True)
WCT_AUTOTUNE_WARMUP = _get_env_int("WCT_AUTOTUNE_WARMUP", 2)
WCT_AUTOTUNE_ITERS = _get_env_int("WCT_AUTOTUNE_ITERS", 5)
BENCHMARK_CACHE_VERSION = "1.0"


def get_benchmark_cache_dir() -> str:
    """On-disk autotune winner-cache directory — the ONE place the name is
    resolved (consumed lazily by ``utils/benchmark_cache.py`` at first cache
    access). ``WCT_BENCHMARK_CACHE_DIR`` wins; the long-form
    ``WARPCONVNET_TPU_BENCHMARK_CACHE_DIR`` is accepted as an alias (used by
    ``bench.py`` / ``scripts/tune_bench_cache.py``)."""
    for name in ("WCT_BENCHMARK_CACHE_DIR", "WARPCONVNET_TPU_BENCHMARK_CACHE_DIR"):
        v = os.environ.get(name)
        if v:
            return v
    return os.path.join(
        os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
        "warpconvnet_tpu",
    )

# Low-precision accumulation (reference fp16-accum; here bf16-accum on MXU).
_LOW_PRECISION_ACCUM = _get_env_bool("WCT_USE_BF16_ACCUM", False)

# Global default compute dtype for sparse convs (the analog of the
# reference's AMP-aware feature access, geometry.py amp_aware_dtype):
# None keeps input dtype; "bfloat16" casts features+weights to bf16 at the
# conv boundary (fp32 accumulation unless bf16-accum is also enabled).
_COMPUTE_DTYPE: Optional[str] = os.environ.get("WCT_COMPUTE_DTYPE") or None


def get_compute_dtype() -> Optional[str]:
    return _COMPUTE_DTYPE


def set_compute_dtype(value: Optional[str]) -> None:
    """Set the global conv compute dtype (e.g. 'bfloat16'); None disables."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = value


def get_low_precision_accum() -> bool:
    return _LOW_PRECISION_ACCUM


def set_low_precision_accum(value: bool) -> None:
    """Opt into bf16 accumulation in Pallas GEMM tiles (reference
    ``set_fp16_accum``, constants.py:244)."""
    global _LOW_PRECISION_ACCUM
    _LOW_PRECISION_ACCUM = bool(value)


# Aliases keeping reference API names discoverable.
get_fp16_accum = get_low_precision_accum
set_fp16_accum = set_low_precision_accum


# FLOP audit: when set to a list, spatially_sparse_conv appends one
# (pair_count, c_in, c_out) record per conv call (pair_count is a traced or
# concrete scalar — run the audited forward eagerly to read values). Used by
# bench.py to compute achieved TFLOP/s and MFU vs the chip's bf16 peak.
WCT_FLOP_AUDIT: Optional[list] = None

# Conv shape audit: when set to a list, spatially_sparse_conv appends one
# STATIC record per conv call:
#   (n_in_cap, n_out_cap, c_in, c_out, k_vol, stride_prod, transposed,
#    generative)
# All fields are Python ints/bools (trace-safe), so the full inventory of a
# model's conv dispatches can be collected with jax.eval_shape — no compute.
# scripts/tune_bench_cache.py uses it to tune EXACTLY the configs the bench
# model dispatches (the analog of the reference's tune-on-first-call
# workflow, detail/unified.py:203-213).
WCT_CONV_SHAPE_AUDIT: Optional[list] = None
