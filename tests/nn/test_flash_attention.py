"""Segment attention parity: the xla fallback must equal masked_sdpa with the
pair mask it encodes; the flash path is checked on TPU (scripts/
validate_flash.py) and via the identical segment semantics here."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.nn.functional.attention import masked_sdpa
from warpconvnet_tpu.nn.functional.flash_attention import (
    segment_attention,
    segment_ids_from_groups,
    segment_ids_from_valid,
)


def _qkv(rng, b=2, s=64, h=4, d=16):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return q, k, v


def test_valid_segments_match_masked_sdpa():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    nv = jnp.asarray([40, 64])
    valid = jax.lax.broadcasted_iota(jnp.int32, (2, 64), 1) < nv[:, None]
    seg = segment_ids_from_valid(valid)
    got = segment_attention(q, k, v, seg, impl="xla")
    ref = masked_sdpa(q, k, v, valid, valid)
    got = jnp.where(valid[..., None, None], got, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_segments_match_pair_mask():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, s=96)
    groups = jnp.asarray(rng.integers(0, 5, size=(2, 96)), jnp.int32)
    nv = jnp.asarray([70, 96])
    valid = jax.lax.broadcasted_iota(jnp.int32, (2, 96), 1) < nv[:, None]
    seg = segment_ids_from_groups(groups, valid)
    got = segment_attention(q, k, v, seg, impl="xla")
    got = jnp.where(valid[..., None, None], got, 0)
    pair = (groups[:, :, None] == groups[:, None, :]) & valid[:, None, :] & valid[:, :, None]
    ref = masked_sdpa(q, k, v, valid, valid, pair)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_cross_attention_segments():
    rng = np.random.default_rng(2)
    b, sq, skv, h, d = 2, 48, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    vq = jax.lax.broadcasted_iota(jnp.int32, (b, sq), 1) < jnp.asarray([30, 48])[:, None]
    vkv = jax.lax.broadcasted_iota(jnp.int32, (b, skv), 1) < jnp.asarray([32, 20])[:, None]
    got = segment_attention(
        q, k, v, segment_ids_from_valid(vq), segment_ids_from_valid(vkv),
        impl="xla",
    )
    got = jnp.where(vq[..., None, None], got, 0)
    ref = masked_sdpa(q, k, v, vq, vkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_grads_finite_with_padding():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, b=1, s=32)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) < 7
    seg = segment_ids_from_valid(valid)

    def loss(q, k, v):
        out = segment_attention(q, k, v, seg, impl="xla")
        out = jnp.where(valid[..., None, None], out, 0)
        return jnp.sum(out ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.all(np.isfinite(np.asarray(g)))
