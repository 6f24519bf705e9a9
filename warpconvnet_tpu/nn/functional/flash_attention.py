"""Segment-masked flash attention — the varlen-attention workhorse.

TPU-native replacement for the reference's ``flash_attn_varlen_qkvpacked``
machinery (``nn/functional/flash_attn_utils.py:12-60``,
``nn/modules/attention.py:200-293``): where the reference packs ragged
sequences into a concatenated buffer with ``cu_seqlens``, the padded-batch
layout here expresses the same structure as **segment ids** — rows attend
exactly the rows with an equal segment id. This one primitive serves:

* global attention over a ragged batch (segment = scene validity),
* window attention (segment = window rank after window sorting),
* patch attention (segment = patch index after Morton serialization),
* cross attention (independent q / kv segment ids).

Memory is O(S * block) instead of the O(S^2) score matrix of
:func:`warpconvnet_tpu.nn.functional.attention.masked_sdpa`, which unlocks
the reference's "all"/global attention paths (``space_attention.py
AllAttention:238``, Volt's global trunk) at 100k+ voxel counts.

Implementation: the stock Pallas TPU kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) with ``SegmentIds``,
wrapped with padding glue (head dim to the 128-lane register width, sequence
to the block size) and an XLA masked-SDPA fallback for CPU tests and tiny
sequences.

Padding contract (NaN-free): pad rows are given one shared sentinel segment
id, so they attend *each other* rather than nothing — no fully-masked softmax
rows exist, forward and backward stay finite, and callers mask pad outputs
(their cotangents are zero, so no gradient leaks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from warpconvnet_tpu.nn.functional.attention import masked_sdpa

_PAD_SEGMENT = jnp.int32(2_000_000_000)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def segment_ids_from_valid(row_valid: jnp.ndarray) -> jnp.ndarray:
    """[..., S] bool -> int32 segment ids: one segment per scene's valid rows,
    the shared pad sentinel elsewhere."""
    return jnp.where(row_valid, 0, _PAD_SEGMENT).astype(jnp.int32)


def segment_ids_from_groups(
    group: jnp.ndarray, row_valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """[..., S] int group labels (e.g. window rank, patch index) -> segment
    ids with pads sentineled."""
    seg = group.astype(jnp.int32)
    if row_valid is not None:
        seg = jnp.where(row_valid, seg, _PAD_SEGMENT)
    return seg


def segment_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seg_q: jnp.ndarray,
    seg_kv: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    block_size: int = 512,
) -> jnp.ndarray:
    """Attention where query row i attends kv row j iff seg_q[i] == seg_kv[j].

    Args:
      q: [B, Sq, H, D]; k, v: [B, Skv, H, D].
      seg_q: [B, Sq] int32; seg_kv: [B, Skv] int32 (defaults to seg_q).
      scale: softmax scale (default D**-0.5).
      impl: "flash" | "xla" | None (auto: flash on TPU for Sq >= 1024).
    Returns [B, Sq, H, D] in q's dtype.
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if seg_kv is None:
        seg_kv = seg_q
    scale = scale if scale is not None else d ** -0.5

    if impl is None:
        from warpconvnet_tpu import constants

        # Auto: flash whenever the masked score matrix would be large (the
        # xla path materializes B*H*Sq*Skv fp32 logits).
        big = sq >= 1024 or sq * skv >= 512 * 1024
        impl = getattr(constants, "WCT_ATTENTION_IMPL", None) or (
            "flash" if _on_tpu() and big else "xla"
        )

    if impl == "xla":
        pair = seg_q[:, :, None] == seg_kv[:, None, :]
        return masked_sdpa(q, k, v, None, None, pair, scale=scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    # Pad head dim to the 128-lane register width; scale is applied on the
    # original D. Pad sequences to the block size with sentinel-segment rows.
    dp = _round_up(d, 128)
    bq = min(block_size, _round_up(sq, 128))
    bkv = min(block_size, _round_up(skv, 128))
    sqp = _round_up(sq, bq)
    # Always add >= 1 sentinel kv row so padded queries are never a
    # fully-masked softmax row even when the caller's kv has no padding.
    skvp = _round_up(skv + 1, bkv)

    def pad_qkv(x, sp):
        s = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0), (0, dp - d)))

    qp = pad_qkv(q, sqp)
    kp = pad_qkv(k, skvp)
    vp = pad_qkv(v, skvp)
    # Pad rows on both sides share the sentinel segment, so padded queries
    # attend padded kv rows (finite softmax) and real rows never see them.
    seg_qp = jnp.pad(seg_q, ((0, 0), (0, sqp - sq)), constant_values=int(_PAD_SEGMENT))
    seg_kvp = jnp.pad(seg_kv, ((0, 0), (0, skvp - skv)), constant_values=int(_PAD_SEGMENT))

    qt = jnp.transpose(qp, (0, 2, 1, 3))  # [B, H, S, D]
    kt = jnp.transpose(kp, (0, 2, 1, 3))
    vt = jnp.transpose(vp, (0, 2, 1, 3))

    block_sizes = fa.BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv,
        block_q_dkv=bq,
        block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )
    out = fa.flash_attention(
        qt, kt, vt,
        segment_ids=fa.SegmentIds(q=seg_qp, kv=seg_kvp),
        causal=False,
        sm_scale=float(scale),
        block_sizes=block_sizes,
    )
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :sq, :, :d]
    return out.astype(q.dtype)
