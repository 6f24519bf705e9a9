"""Validate the Pallas flash segment-attention path on the real chip against
the XLA masked path, at sizes masked_sdpa can still materialize; then time
flash at 128k rows where masked_sdpa cannot."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpconvnet_tpu.nn.functional.flash_attention import (
    segment_attention,
    segment_ids_from_groups,
)


def main():
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 4096, 8, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    nv = jnp.asarray([s - 700, s])
    valid = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) < nv[:, None]
    groups = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) // 512
    seg = segment_ids_from_groups(groups, valid)

    fl = jax.jit(lambda q, k, v: segment_attention(q, k, v, seg, impl="flash"))
    xl = jax.jit(lambda q, k, v: segment_attention(q, k, v, seg, impl="xla"))
    a = np.asarray(jax.device_get(fl(q, k, v))).astype(np.float32)
    bb = np.asarray(jax.device_get(xl(q, k, v))).astype(np.float32)
    a = np.where(np.asarray(valid)[..., None, None], a, 0)
    bb = np.where(np.asarray(valid)[..., None, None], bb, 0)
    err = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-6)
    print(f"flash vs xla rel err (4k rows, grouped+padded): {err:.3e}")
    assert err < 3e-2, err

    # gradient parity
    def loss(fn, q, k, v):
        out = fn(q, k, v)
        out = jnp.where(valid[..., None, None], out, 0)
        return jnp.sum((out.astype(jnp.float32)) ** 2)

    gf = jax.jit(jax.grad(lambda q: loss(lambda *a: segment_attention(
        *a, seg_q=seg, impl="flash"), q, k, v)))(q)
    gx = jax.jit(jax.grad(lambda q: loss(lambda *a: segment_attention(
        *a, seg_q=seg, impl="xla"), q, k, v)))(q)
    ga, gb = np.asarray(gf, np.float32), np.asarray(gx, np.float32)
    gerr = np.abs(ga - gb).max() / max(np.abs(gb).max(), 1e-6)
    print(f"flash vs xla dq rel err: {gerr:.3e}")
    assert gerr < 5e-2, gerr
    assert np.all(np.isfinite(ga))

    # global attention at 128k rows (masked_sdpa would need a 64GB matrix)
    s2 = 1 << 17
    q2 = jnp.asarray(rng.standard_normal((1, s2, 8, 64)), jnp.bfloat16)
    seg2 = jnp.zeros((1, s2), jnp.int32)
    f2 = jax.jit(lambda q: segment_attention(q, q, q, seg2, impl="flash").sum())
    out = f2(q2)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f2(q2)
    _ = float(out)
    print(f"flash global attention 131k rows, 8h x 64d: "
          f"{(time.perf_counter()-t0)/3*1e3:.1f} ms")


if __name__ == "__main__":
    main()
