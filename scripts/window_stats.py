"""CPU-side window statistics on the bench scene — sizes the igemm windows
before burning chip compiles:

1. Per-(offset, tile) spread of the submanifold 3^3 map at tile_m=256
   (what window_factor really needs per-offset vs per-group).
2. Union spans over S consecutive tiles (multi-tile DMA sizing).
3. Strided (2x) map spreads raw vs parity-partitioned gather source
   (whether parity partitioning makes strided igemm viable).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from bench import make_surface_scene
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    build_batched_pair_table,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD

TILE = 256


def spread_stats(table, n_in, name, tile=TILE, align=16):
    """table [K, M] single scene; prints per-offset spread percentiles."""
    k, m = table.shape
    t = m // tile
    tiles = table[:, : t * tile].reshape(k, t, tile)
    valid = tiles >= 0
    big = 1 << 30
    lo = np.where(valid, tiles, big).min(axis=2)
    hi = np.where(valid, tiles, -1).max(axis=2)
    any_v = valid.any(axis=2)
    lo_al = lo & ~(align - 1)
    spread = np.where(any_v, hi - lo_al + 1, 0)  # rows needed per (k, t)
    p = np.percentile(spread[any_v], [50, 90, 99, 99.9, 100])
    print(f"{name:44s} spread p50={p[0]:6.0f} p90={p[1]:6.0f} p99={p[2]:6.0f} "
          f"p99.9={p[3]:6.0f} max={p[4]:6.0f}")
    for s in (2, 4, 8):
        ts = t // s * s
        lo2 = lo[:, :ts].reshape(k, -1, s).min(axis=2)
        hi2 = hi[:, :ts].reshape(k, -1, s).max(axis=2)
        av2 = any_v[:, :ts].reshape(k, -1, s).any(axis=2)
        sp2 = np.where(av2, hi2 - (lo2 & ~(align - 1)) + 1, 0)
        if not av2.any():
            continue
        q = np.percentile(sp2[av2], [50, 99, 99.9, 100])
        print(f"   union S={s}: p50={q[0]:7.0f} p99={q[1]:7.0f} "
              f"p99.9={q[2]:7.0f} max={q[3]:7.0f}  (per-tile {q[1]/s:6.0f})")
    return spread


def overflow_at(table, window, tile=TILE, align=16, per_offset=True):
    k, m = table.shape
    t = m // tile
    tiles = table[:, : t * tile].reshape(k, t, tile)
    valid = tiles >= 0
    big = 1 << 30
    lo = np.where(valid, tiles, big).min(axis=2) & ~(align - 1)
    local = tiles - lo[:, :, None]
    ovf = valid & ((local < 0) | (local >= window))
    return int(ovf.sum()), int(valid.sum())


def main():
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    c = make_surface_scene(rng, n_cap)
    n = len(c)
    coords = np.full((1, n_cap, 3), PAD_COORD, np.int32)
    coords[0, :n] = c
    vox = Voxels.create(
        jnp.asarray(coords), jnp.zeros((1, n_cap, 1), jnp.float32),
        jnp.asarray([n]),
    ).lex_sort()
    print(f"scene: {n} voxels")

    offs = kernel_offsets(3)
    bpt = build_batched_pair_table(
        vox.coords, vox.num_valid, vox.coords, vox.num_valid, offs,
        self_map=True, assume_sorted=True, queries_sorted=True,
    )
    tbl = np.asarray(bpt.table[0])
    print(f"submanifold pairs: {(tbl >= 0).sum()} "
          f"hit-rate {(tbl >= 0).mean():.3f}")
    spread_stats(tbl, n_cap, "submanifold 3^3 (per-offset windows)")
    for w in (288, 320, 384, 512):
        o, v = overflow_at(tbl, w)
        print(f"   overflow @W={w}: {o} / {v}")

    # group-level (zg=3) windows: min over group
    k, m = tbl.shape
    g = k // 3
    t = m // TILE
    tiles = tbl[:, : t * TILE].reshape(k, t, TILE)
    valid = tiles >= 0
    big = 1 << 30
    lo = np.where(valid, tiles, big).min(axis=2)
    glo = lo.reshape(g, 3, t).min(axis=1)
    hi = np.where(valid, tiles, -1).max(axis=2).reshape(g, 3, t).max(axis=1)
    gv = valid.any(axis=2).reshape(g, 3, t).any(axis=1)
    sp = np.where(gv, hi - (glo & ~15) + 1, 0)
    p = np.percentile(sp[gv], [50, 99, 100])
    print(f"zg=3 group windows: p50={p[0]:.0f} p99={p[1]:.0f} max={p[2]:.0f}")

    # ---- strided map ------------------------------------------------------
    oc, onv, btab, _ = generate_output_coords_and_kernel_map(
        vox.replace(features=jnp.zeros((1, n_cap, 1), jnp.float32)), 3, 2
    )
    stbl = np.asarray(btab.table[0])
    n_out = int(np.asarray(onv)[0])
    print(f"\nstride-2 map: n_out={n_out} pairs={(stbl >= 0).sum()}")
    spread_stats(stbl[:, : (n_out // TILE) * TILE], n_cap,
                 "stride-2 3^3 raw gather source")

    # Parity partition: reorder inputs by (parity byte, lex) and remap table.
    cc = c.astype(np.int64)
    parity = (cc[:, 0] & 1) * 4 + (cc[:, 1] & 1) * 2 + (cc[:, 2] & 1)
    order = np.lexsort((np.arange(n), parity))  # stable: lex order kept per class
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    remap = np.full(n_cap, -1, np.int64)
    remap[:n] = rank
    stbl_p = np.where(stbl >= 0, remap[np.clip(stbl, 0, n_cap - 1)], -1)
    spread_stats(stbl_p[:, : (n_out // TILE) * TILE], n_cap,
                 "stride-2 parity-partitioned")
    for w in (320, 384, 512, 768):
        o, v = overflow_at(stbl_p[:, : (n_out // TILE) * TILE], w)
        print(f"   overflow @W={w}: {o} / {v}")

    # Per-offset parity class check: each offset should map into ONE class.
    for kk in range(27):
        hits = stbl[kk][stbl[kk] >= 0]
        if len(hits):
            cls = np.unique(parity[hits])
            assert len(cls) == 1, (kk, cls)
    print("per-offset single-parity-class: confirmed")


def rev_stats():
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    c = make_surface_scene(rng, n_cap)
    n = len(c)
    coords = np.full((1, n_cap, 3), PAD_COORD, np.int32)
    coords[0, :n] = c
    vox = Voxels.create(
        jnp.asarray(coords), jnp.zeros((1, n_cap, 1), jnp.float32),
        jnp.asarray([n]),
    ).lex_sort()
    oc, onv, btab, _ = generate_output_coords_and_kernel_map(vox, 3, 2)
    rev = np.asarray(btab.rev[0])
    n_out = int(np.asarray(onv)[0])
    print(f"stride-2 REV map (dgrad gather from {n_out} coarse rows, "
          f"queries = {n} fine rows)")
    spread_stats(rev[:, : (n // TILE) * TILE], n_out, "stride-2 rev (raw)")
    for w in (256, 320, 384, 512):
        o, v = overflow_at(rev[:, : (n // TILE) * TILE], w)
        print(f"   overflow @W={w}: {o} / {v}")
    # transposed fwd: the decoder gathers coarse->fine with the rev table too
    # (same table, reversed role) — covered above.


def unet_stats():
    """Walk the MinkUNet18 level cascade (ks=2/stride-2 downs, per-level caps
    halving as in bench.py) and report per-level window needs for every conv
    direction: submanifold 3^3 fwd (= wgrad source; rev is the K-flip),
    strided ks=2 fwd/wgrad (gather fine), strided rev (dgrad, gather coarse;
    also the transposed decoder's fwd source)."""
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    c = make_surface_scene(rng, n_cap)
    n = len(c)
    coords = np.full((1, n_cap, 3), PAD_COORD, np.int32)
    coords[0, :n] = c
    vox = Voxels.create(
        jnp.asarray(coords), jnp.zeros((1, n_cap, 1), jnp.float32),
        jnp.asarray([n]),
    ).lex_sort()
    caps = [max(n_cap // (1 << i), 128) for i in range(5)]
    offs3 = kernel_offsets(3)

    for lvl in range(5):
        nv = int(np.asarray(vox.num_valid)[0])
        cap = vox.coords.shape[1]
        print(f"\n== level {lvl}: n={nv} cap={cap} ==")
        bpt = build_batched_pair_table(
            vox.coords, vox.num_valid, vox.coords, vox.num_valid, offs3,
            self_map=True, assume_sorted=True, queries_sorted=True,
        )
        tbl = np.asarray(bpt.table[0])
        t_sub = max(nv // TILE, 1) * TILE
        print(f"  sub 3^3 pairs={(tbl >= 0).sum()} hit={(tbl >= 0).mean():.3f}")
        spread_stats(tbl[:, : min(t_sub, tbl.shape[1] // TILE * TILE)], cap,
                     f"  L{lvl} submanifold 3^3")
        if lvl == 4:
            break
        oc, onv, btab, _ = generate_output_coords_and_kernel_map(
            vox, 2, 2, out_capacity=caps[lvl + 1]
        )
        stbl = np.asarray(btab.table[0])
        rev = np.asarray(btab.rev[0])
        n_out = int(np.asarray(onv)[0])
        print(f"  stride-2 ks2: n_out={n_out} pairs={(stbl >= 0).sum()}")
        t_o = max(n_out // TILE, 1) * TILE
        spread_stats(stbl[:, :t_o], cap, f"  L{lvl} ks2 fwd (gather fine)")
        t_i = max(nv // TILE, 1) * TILE
        spread_stats(rev[:, : min(t_i, rev.shape[1] // TILE * TILE)],
                     caps[lvl + 1], f"  L{lvl} ks2 rev (gather coarse)")
        vox = Voxels.create(
            oc, jnp.zeros((1, oc.shape[1], 1), jnp.float32), onv
        ).replace(lex_sorted=True)


if __name__ == "__main__":
    if os.environ.get("WS_REV"):
        rev_stats()
    elif os.environ.get("WS_UNET"):
        unet_stats()
    else:
        main()
