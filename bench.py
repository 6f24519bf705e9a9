"""Benchmark: MinkUNet18 training step (fwd+bwd+adam, kernel maps built
in-step) at ScanNet scale — the TPU analog of the reference's
``scripts/bench_unet_gb300.py`` workload (N≈250k total, B=2, C 32→256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the value recorded in BENCH_BASELINE.json
(round-1 explicit-backend measurement; the reference publishes no absolute
numbers — see BASELINE.md).
"""

import json
import os
import socket
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def hb(msg):
    """Flushed heartbeat so a driver timeout is diagnosable (which phase
    wedged) instead of silent — VERDICT r4 weak #1."""
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _tpu_tunnel_alive() -> bool:
    """The axon TPU tunnel relays via local ports; when its relay process
    dies, any jax import/dial HANGS forever. Fail fast instead so the
    caller sees an error rather than a wedged benchmark."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # not an axon environment — let jax decide
    for port in (8083, 8082, 8093):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def make_surface_scene(rng, n_cap, coord_range=512, n_points=120_000):
    """Surface-like voxel scene: sample (x, y) columns of a smooth heightfield
    with jitter — ScanNet-ish local density for realistic kernel-map hit rates."""
    xy = rng.integers(0, coord_range, size=(n_points, 2))
    z = (
        coord_range // 2
        + 60.0 * np.sin(xy[:, 0] / 37.0) * np.cos(xy[:, 1] / 29.0)
        + rng.normal(0, 1.5, n_points)
    ).astype(np.int32)
    coords = np.concatenate([xy, z[:, None]], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    if len(coords) > n_cap:
        coords = coords[rng.permutation(len(coords))[:n_cap]]
    return coords


def main():
    if not _tpu_tunnel_alive():
        print(
            "# TPU tunnel ports unreachable (relay process dead?) — "
            "aborting instead of hanging on the backend dial",
            file=sys.stderr,
        )
        sys.exit(2)
    # Use the committed pre-tuned cache (real-map winners per MinkUNet
    # level, scripts/tune_bench_cache.py) unless the user points elsewhere.
    _data_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"
    )
    if (
        "WARPCONVNET_TPU_BENCHMARK_CACHE_DIR" not in os.environ
        and os.path.exists(os.path.join(_data_cache, "benchmark_cache.json"))
    ):
        os.environ["WARPCONVNET_TPU_BENCHMARK_CACHE_DIR"] = _data_cache

    import jax

    # Cache EVERY compiled program. The axon tunnel pays ~0.4 s of remote
    # compile RPC even for jit(bitwise_and); one bench run builds 800+ such
    # tiny programs before the train step (scripts/compile_census.py), so a
    # min-compile-time threshold of 5 s re-paid ~6 min of compiles per run.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import optax

    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.models.mink_unet import MinkUNet18
    from warpconvnet_tpu.ops.keys import PAD_COORD
    from warpconvnet_tpu.parallel import create_train_state, make_segmentation_train_step

    hb(f"imports done (backend {jax.default_backend()}, {jax.devices()})")

    b = 2
    n_cap = 1 << 17  # 131072 per scene -> ~250k total voxels
    num_classes = 20
    rng = np.random.default_rng(0)

    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, 3), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = rng.standard_normal((len(c), 3)).astype(np.float32)
    vox = Voxels.create(coords, feats, nv)
    labels = jnp.asarray(rng.integers(0, num_classes, size=(b, n_cap)).astype(np.int32))
    total_points = int(nv.sum())

    # bf16 conv compute (fp32 params + accumulation) — the TPU analog of the
    # reference's fp16 benchmark config (scripts/bench_unet_gb300.py).
    from warpconvnet_tpu import constants
    constants.set_compute_dtype("bfloat16")
    # Default "auto" dispatch: lex_sort() marks the inputs sorted, which
    # enables the Pallas probe + implicit-GEMM fast paths without flags
    # (WCT_BENCH_ALGO overrides for A/B runs, e.g. "explicit").
    algo = os.environ.get("WCT_BENCH_ALGO", "auto")
    constants.WCT_FWD_ALGO_MODE = algo
    constants.WCT_DGRAD_ALGO_MODE = algo
    constants.WCT_WGRAD_ALGO_MODE = algo
    vox = vox.lex_sort()
    hb(f"data built + lex-sorted ({total_points} voxels, algo={algo})")

    model = MinkUNet18(in_channels=3, out_channels=num_classes)
    tx = optax.adam(1e-3)
    t0 = time.perf_counter()
    state = create_train_state(model, tx, vox, train=False)
    hb("train state created (params init + plan warmup)")
    step = make_segmentation_train_step(model, tx, num_classes)
    hb("compiling + running train step 1 ...")

    # Warmup / compile. NOTE: on the tunneled TPU backend block_until_ready
    # does not synchronize; a host value fetch does. Timing below chains
    # n_steps dispatches and fetches the final loss once (one ~28 ms RPC
    # round-trip amortized across the chain).
    state, metrics = step(state, vox, labels)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    hb(f"step 1 done (compile+run {compile_s:.0f}s) — timing {os.environ.get('WCT_BENCH_STEPS', '10')} steps")

    n_steps = int(os.environ.get("WCT_BENCH_STEPS", "10"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, vox, labels)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    hb(f"timed {n_steps} steps in {dt:.2f}s")
    step_ms = dt / n_steps * 1e3
    pps = total_points * n_steps / dt

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("minkunet18_train_points_per_sec")
    vs = (pps / baseline) if baseline else 1.0

    # Useful-FLOP audit: eager forward with the conv recorder captures the
    # true pair count of every kernel map (2*pairs*Cin*Cout MACs per conv;
    # train step ~= 3x forward for fwd+dgrad+wgrad). MFU is vs the v5e
    # bf16 peak (197 TFLOP/s).
    mfu = tflops = None
    try:
        if os.environ.get("WCT_BENCH_FLOP_AUDIT", "1") != "1":
            raise RuntimeError("disabled via WCT_BENCH_FLOP_AUDIT")
        hb("running eager FLOP-audit forward ...")
        constants.WCT_FLOP_AUDIT = audit = []
        _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            vox, train=False,
        )
        fwd_flops = float(
            sum(2.0 * float(p) * ci * co / g for p, ci, co, g in audit)
        )
        constants.WCT_FLOP_AUDIT = None
        train_flops = 3.0 * fwd_flops
        tflops = train_flops / (step_ms / 1e3) / 1e12
        peak = 197.0  # v5e bf16 peak TFLOP/s
        mfu = tflops / peak
    except Exception as e:  # audit is diagnostic-only; never break the bench
        constants.WCT_FLOP_AUDIT = None
        print(f"# flop audit failed: {e}", file=sys.stderr)

    print(
        f"# MinkUNet18 train step: {step_ms:.1f} ms/step, {total_points} pts, "
        f"compile {compile_s:.0f}s, loss {float(metrics['loss']):.3f}",
        file=sys.stderr,
    )
    # Autotune cache accounting: an untuned run must be VISIBLE (VERDICT r3
    # weak #2 — the r03 headline silently ran on the cache-miss heuristic).
    from warpconvnet_tpu.utils.benchmark_cache import get_benchmark_cache

    _bc = get_benchmark_cache()
    print(
        f"# autotune cache: {_bc.hits} hits / {_bc.misses} misses "
        f"(dir {_bc.cache_dir})",
        file=sys.stderr,
    )
    for mk in sorted(_bc.missed_keys):
        print(f"#   MISS {mk}", file=sys.stderr)
    if mfu is not None:
        print(
            f"# useful conv compute: {tflops:.2f} TFLOP/s achieved, "
            f"MFU {100 * mfu:.2f}% of v5e bf16 peak",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "minkunet18_train_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
