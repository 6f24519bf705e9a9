"""CPU window statistics for strided K=8 maps under FULL-block grouping.

Question: the strided 2^3 fwd table gathers the fine side, whose matches
for one coarse output tile are (union over all 8 offsets) exactly the fine
rows inside the tile's coarse range — a CONTIGUOUS region of the canonical
fine lex order of width ~ (N_in/N_out) * tile. So zg=K=8 with a larger
window factor should serve the whole map with ONE window DMA + one batched
one-hot matmul per tile, with no parity permutation (the current parity
path forces zg=1, one DMA per offset, and loses to explicit at every
level). This script measures the per-(block, tile) union spread of the
strided fwd and reverse (dgrad) tables at every UNet level to size wf.
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
from window_stats_zg9 import group_spread, per_tile_overflow  # noqa: E402


def report(tbl, name, tile=256):
    p, _, _ = group_spread(tbl, tbl.shape[0], tile=tile)
    print(f"  {name:10s} tile={tile} zg=K spread p50={p[0]:5.0f} "
          f"p99={p[2]:6.0f} p99.9={p[3]:7.0f} max={p[4]:7.0f}")
    for wf in (2.0, 3.0, 4.0, 6.0):
        w = int(wf * tile + 15) // 16 * 16
        ov, tot = per_tile_overflow(tbl, tbl.shape[0], w, tile=tile)
        print(f"      wf={wf:4.1f} (wt={w:5d}): overflow {ov} / {tot}"
              f" ({100 * ov / max(tot, 1):.3f}%)")


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
    for lvl in range(4):
        n_val = int(np.asarray(cur.num_valid[0]))
        oc, onv, t_dn, ts = generate_output_coords_and_kernel_map(
            cur, 2, 2, out_capacity=caps[lvl + 1]
        )
        n_out = int(np.asarray(onv[0]))
        print(f"\n== level {lvl} (n_in={n_val}, n_out={n_out}, "
              f"ratio={n_val / max(n_out, 1):.2f}) strided 2^3 ==")
        report(np.asarray(t_dn.table[0]), "fwd")
        report(np.asarray(t_dn.reversed().table[0]), "dgrad(rev)")
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
