"""Census of XLA programs compiled by one bench.py-shaped run.

The axon tunnel pays a remote-compile RPC per program, so the bench's
cold-start wall-clock is roughly (number of distinct programs) x (per-program
RPC latency) + (the one big train-step program). This script runs the bench
workload at reduced size on CPU and prints every compile with its phase, so
we can attack the count (VERDICT r4 next #1b).

Usage: JAX_PLATFORMS=cpu python scripts/compile_census.py [n_cap_log2=12]
"""

import logging
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_log_compiles", True)

PHASE = {"name": "startup", "counts": {}, "order": []}


class CompileCounter(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" not in msg and "Finished XLA compilation" not in msg:
            return
        if msg.startswith("Compiling"):
            name = msg.split()[1]
            ph = PHASE["name"]
            PHASE["counts"].setdefault(ph, []).append(name)
            PHASE["order"].append((ph, name))


handler = CompileCounter()
for lname in ("jax._src.interpreters.pxla", "jax._src.dispatch", "jax"):
    lg = logging.getLogger(lname)
    lg.addHandler(handler)
    lg.setLevel(logging.DEBUG)


def set_phase(name):
    PHASE["name"] = name
    print(f"--- phase: {name}", flush=True)


def main():
    n_cap = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 12)
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_surface_scene
    from warpconvnet_tpu import constants
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.models.mink_unet import MinkUNet18
    from warpconvnet_tpu.ops.keys import PAD_COORD
    from warpconvnet_tpu.parallel import create_train_state, make_segmentation_train_step

    b = 2
    num_classes = 20
    rng = np.random.default_rng(0)

    set_phase("data_build")
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, 3), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap, n_points=n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = rng.standard_normal((len(c), 3)).astype(np.float32)
    vox = Voxels.create(coords, feats, nv)
    labels = jnp.asarray(rng.integers(0, num_classes, size=(b, n_cap)).astype(np.int32))

    constants.set_compute_dtype("bfloat16")
    set_phase("lex_sort")
    vox = vox.lex_sort()
    jax.block_until_ready(vox.coords)

    set_phase("create_train_state")
    model = MinkUNet18(in_channels=3, out_channels=num_classes)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, vox, train=False)

    set_phase("train_step")
    step = make_segmentation_train_step(model, tx, num_classes)
    t0 = time.perf_counter()
    state, metrics = step(state, vox, labels)
    print(f"step compile+run: {time.perf_counter() - t0:.1f}s loss={float(metrics['loss']):.3f}")

    set_phase("second_step")
    state, metrics = step(state, vox, labels)
    _ = float(metrics["loss"])

    set_phase("flop_audit")
    constants.WCT_FLOP_AUDIT = audit = []
    _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, vox, train=False
    )
    constants.WCT_FLOP_AUDIT = None

    print("\n=== compile census ===")
    total = 0
    for ph in ["startup", "data_build", "lex_sort", "create_train_state",
               "train_step", "second_step", "flop_audit"]:
        names = PHASE["counts"].get(ph, [])
        total += len(names)
        print(f"{ph}: {len(names)} programs")
        from collections import Counter
        for name, cnt in Counter(names).most_common(12):
            print(f"    {cnt:3d}x {name}")
    print(f"TOTAL: {total} programs")


if __name__ == "__main__":
    main()
