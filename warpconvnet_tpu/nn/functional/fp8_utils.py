"""fp8 quantize/dequantize helpers (reference ``nn/functional/fp8_utils.py``).

TPU v5+ supports e4m3/e5m2 storage; compute happens in bf16/f32 after
dequantization (or natively on MXU where supported).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

FP8_FORMATS = {
    "e4m3": (jnp.float8_e4m3fn, 448.0),
    "e5m2": (jnp.float8_e5m2, 57344.0),
}


def quantize_fp8(
    x: jnp.ndarray, fmt: str = "e4m3", axis=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale by absmax to the format's max value and cast. Returns (q, scale)
    with x ≈ q.astype(f32) * scale."""
    dtype, max_val = FP8_FORMATS[fmt]
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(absmax, 1e-12) / max_val
    q = (x / scale).astype(dtype)
    return q, scale.astype(jnp.float32)


def dequantize_fp8(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return q.astype(dtype) * scale.astype(dtype)
