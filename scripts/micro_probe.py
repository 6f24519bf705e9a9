"""Primitive-level TPU timing: sort / binary search / scatter / gather /
matmul — identifies which coordinate-engine primitive is slow on this chip.
Each case is timed by chaining dispatches and fetching one scalar.
"""

import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax import lax


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:9.1f} ms  (first {first:6.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    n = 131072
    q = 27 * n
    print(f"devices: {jax.devices()}", flush=True)

    keys_hi = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
    keys_lo = jnp.asarray(rng.integers(0, 512, n), jnp.int32)
    payload = jnp.asarray(np.arange(n), jnp.int32)

    @jax.jit
    def sort2(a, b, p):
        out = lax.sort((a, b, p), num_keys=2, is_stable=True)
        return out[2].sum()

    timeit("sort 131k 2-key +payload", sort2, keys_hi, keys_lo, payload)

    qh = jnp.asarray(rng.integers(0, 2**31 - 1, q), jnp.int32)
    ql = jnp.asarray(rng.integers(0, 512, q), jnp.int32)
    sh = jnp.sort(keys_hi)

    @jax.jit
    def bsearch(sh, sl, qh, ql):
        from warpconvnet_tpu.ops.keys import searchsorted_keys

        pos = searchsorted_keys((sh, sl), (qh, ql))
        return pos.sum()

    timeit("2-key binary search 3.5M queries", bsearch, sh, keys_lo, qh, ql)

    @jax.jit
    def bsearch1(s, qv):
        return jnp.searchsorted(s, qv).astype(jnp.int32).sum()

    timeit("native searchsorted 3.5M 1-key", bsearch1, sh, qh)

    idx = jnp.asarray(rng.integers(0, n, q), jnp.int32)

    @jax.jit
    def gather1(p, i):
        return p[i].sum()

    timeit("gather 3.5M of [131k] int32", gather1, payload, idx)

    @jax.jit
    def scatter1(i):
        out = jnp.full((n,), -1, jnp.int32)
        out = out.at[i].set(lax.broadcasted_iota(jnp.int32, (q,), 0), mode="drop")
        return out.sum()

    timeit("scatter 3.5M -> [131k] int32", scatter1, idx)

    k_ids = jnp.asarray(rng.integers(0, 27, q), jnp.int32)

    @jax.jit
    def scatter2d(k_ids, i):
        out = jnp.full((27, n), -1, jnp.int32)
        out = out.at[k_ids, i].set(
            lax.broadcasted_iota(jnp.int32, (q,), 0), mode="drop"
        )
        return out.sum()

    timeit("2D scatter 3.5M -> [27,131k]", scatter2d, k_ids, idx)

    x = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)

    @jax.jit
    def gather_rows(x, i):
        return x[i[: 8 * n]].sum()

    timeit("row gather 1M x 64ch fp32", gather_rows, x, idx)

    w = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)

    @jax.jit
    def mm(x, w):
        return (x @ w).sum()

    timeit("matmul 131k x 64 x 64", mm, x, w)


if __name__ == "__main__":
    main()
