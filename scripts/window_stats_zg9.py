"""CPU window statistics for dx-major offset grouping ("v5" candidate).

Question: the v4 kernel z-groups the 3 offsets sharing (dx, dy) under one
window DMA (zg=3, G=9 for 3^3). In lex (x, y, z) order a dy=+-1 step moves
the matching row by only ~(points per (x, y) column) ~ O(1) on sparse
scenes, so the 9 offsets sharing dx alone should also fit one window
(zg=9, G=3) — 3x fewer dependent op chains per sub-tile at identical
one-hot FLOPs. This script measures the per-(dx-group, tile) union spread
on the bench scene at every UNet level to size the window factor.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from bench import make_surface_scene  # noqa: E402
from warpconvnet_tpu.geometry.voxels import Voxels  # noqa: E402
from warpconvnet_tpu.nn.functional.sparse_conv import (  # noqa: E402
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD  # noqa: E402

TILE = 256


def group_spread(table, gsize, tile=TILE, align=16, s=1):
    """Union spread per (offset-group, super-tile) for groups of ``gsize``
    consecutive offsets. Returns percentile row plus overflow counts at
    candidate windows."""
    k, m = table.shape
    t = m // (tile * s)
    m2 = t * tile * s
    tiles = table[:, :m2].reshape(k, t, tile * s)
    valid = tiles >= 0
    big = 1 << 30
    g = k // gsize
    gt = tiles.reshape(g, gsize, t, tile * s)
    gv = valid.reshape(g, gsize, t, tile * s)
    lo = np.where(gv, gt, big).min(axis=(1, 3))
    hi = np.where(gv, gt, -1).max(axis=(1, 3))
    any_v = gv.any(axis=(1, 3))
    lo_al = lo & ~(align - 1)
    spread = np.where(any_v, hi - lo_al + 1, 0)
    p = np.percentile(spread[any_v], [50, 90, 99, 99.9, 100])
    # Per-tile (not super-tile) spread for window sizing (wt covers one
    # sub-tile; the union DMA covers wt + (s-1)*tile).
    return p, spread, any_v


def per_tile_overflow(table, gsize, window, tile=TILE, align=16):
    """Overflow pairs when each gsize-group shares a per-TILE window start
    (min over the group's offsets) of width ``window``."""
    k, m = table.shape
    t = m // tile
    m2 = t * tile
    tiles = table[:, :m2].reshape(k, t, tile)
    valid = tiles >= 0
    big = 1 << 30
    g = k // gsize
    gv = valid.reshape(g, gsize, t, tile)
    gt = tiles.reshape(g, gsize, t, tile)
    lo = np.where(gv, gt, big).min(axis=(1, 3))  # [G, T]
    lo = np.where(lo == big, 0, lo & ~(align - 1))
    local = gt - lo[:, None, :, None]
    ovf = gv & ((local < 0) | (local >= window))
    return int(ovf.sum()), int(valid.sum())


def main():
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    b = 2
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
    vox = Voxels.create(
        coords, np.zeros((b, n_cap, 1), np.float32), nv
    ).lex_sort()

    caps = [max(n_cap // (2 ** i), 128) for i in range(5)]
    cur = vox
    for lvl in range(5):
        _, _, t_sub, _ = generate_output_coords_and_kernel_map(cur, 3, 1)
        tbl = np.asarray(t_sub.table[0])  # scene 0
        n_val = int(nv[0]) if lvl == 0 else int(cur.num_valid[0])
        print(f"\n== level {lvl} (n={n_val}) 3^3 self-map ==")
        for tile in (256, 128):
            for gsize, name in ((3, "zg=3 (dx,dy)"), (9, "zg=9 (dx)")):
                p, _, _ = group_spread(tbl, gsize, tile=tile)
                print(f"  tile={tile} {name:14s} spread p50={p[0]:5.0f} "
                      f"p99={p[2]:5.0f} p99.9={p[3]:6.0f} max={p[4]:6.0f}")
                for wf in (1.25, 1.5, 2.0):
                    w = int(wf * tile + 15) // 16 * 16
                    ov, tot = per_tile_overflow(tbl, gsize, w, tile=tile)
                    print(f"      wf={wf:4.2f} (wt={w:4d}): overflow {ov} / {tot}"
                          f" ({100 * ov / max(tot, 1):.3f}%)")
        if lvl < 4:
            oc, onv, _, ts = generate_output_coords_and_kernel_map(
                cur, 2, 2, out_capacity=caps[lvl + 1]
            )
            cur = Voxels(
                coords=oc,
                features=jnp.zeros(oc.shape[:2] + (1,), jnp.float32),
                num_valid=onv,
                voxel_size=cur.voxel_size,
                tensor_stride=ts,
                lex_sorted=True,
            )


if __name__ == "__main__":
    main()
