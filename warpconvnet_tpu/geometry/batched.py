"""Ragged list <-> batched-padded conversion (host side).

The reference's ``BatchedTensor`` (``geometry/base/batched.py``) keeps ragged
batches as a concatenated tensor + offsets; here the device layout is padded
[B, N, ...] and these helpers do the conversion at the data-loading boundary.
Padding capacity is rounded up to a bucket to bound recompiles — the analog of
the reference's log-binned autotune keys (``benchmark_cache.py`` shape bins).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def round_up_bucket(n: int, bucket: int = 1024, growth: float = 1.25) -> int:
    """Round n up to a geometric bucket boundary so jit sees few shapes."""
    cap = bucket
    while cap < n:
        cap = max(cap + bucket, int(math.ceil(cap * growth)))
    return cap


def pad_stack(
    arrays: Sequence[np.ndarray],
    max_len: int | None = None,
    pad_value: float = 0,
    bucket: int | None = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack ragged [Ni, ...] arrays into [B, N, ...] + num_valid [B]."""
    lens = np.array([len(a) for a in arrays], np.int32)
    n = int(lens.max()) if max_len is None else max_len
    if bucket is not None and max_len is None:
        n = round_up_bucket(n, bucket)
    tail_shape = arrays[0].shape[1:]
    out = np.full((len(arrays), n) + tail_shape, pad_value, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        m = min(len(a), n)
        out[i, :m] = a[:m]
    return out, np.minimum(lens, n)


def unpad(array: np.ndarray, num_valid: np.ndarray) -> List[np.ndarray]:
    """Inverse of pad_stack: [B, N, ...] -> list of [Ni, ...]."""
    return [np.asarray(array[i, : int(nv)]) for i, nv in enumerate(num_valid)]


def offsets_from_num_valid(num_valid: np.ndarray) -> np.ndarray:
    """Reference-style offsets [B+1] for interop with concatenated layouts."""
    return np.concatenate([[0], np.cumsum(np.asarray(num_valid))]).astype(np.int64)
