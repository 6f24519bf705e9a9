"""Dual-grid mesh extraction (reference ``models/trellis2/mesh_extract.py``
dual-grid / FlexiDualGrid mesh extraction).

Surface-nets construction over the sparse voxel field produced by
:class:`ShapeVaeDecoder` — per voxel a scalar field sample (sdf) and a
"flexi" vertex = voxel center + predicted offset:

* Every active voxel owns one mesh vertex (its flexi vertex).
* For every primal edge between face-adjacent voxels ``v`` and ``v + e_d``
  whose sdf signs differ, emit the quad of the 4 voxels sharing that edge
  (``v``, ``v - e_u``, ``v - e_w``, ``v - e_u - e_w``), oriented by the sign.

Host-side numpy: mesh extraction is pipeline post-processing, not a jitted
hot path (the reference's is CUDA because everything there is).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from warpconvnet_tpu.geometry.voxels import Voxels

_AXES = ((0, 1, 2), (1, 0, 2), (2, 0, 1))  # (d, u, w)


def dual_grid_mesh_single(
    coords: np.ndarray, sdf: np.ndarray, offsets: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """One scene: coords [N,3] int, sdf [N], offsets [N,3] in [-0.5, 0.5].

    Returns (vertices [V,3] float32, faces [F,3] int32).
    """
    n = len(coords)
    index = {tuple(c): i for i, c in enumerate(map(tuple, coords))}
    verts = coords.astype(np.float32) + 0.5 + offsets.astype(np.float32)
    faces: List[Tuple[int, int, int]] = []

    for d, u, w in _AXES:
        e_d = np.zeros(3, np.int64)
        e_d[d] = 1
        e_u = np.zeros(3, np.int64)
        e_u[u] = 1
        e_w = np.zeros(3, np.int64)
        e_w[w] = 1
        for i, c in enumerate(coords):
            nb = index.get(tuple(c + e_d))
            if nb is None:
                continue
            if (sdf[i] > 0) == (sdf[nb] > 0):
                continue
            quad = []
            ok = True
            for da, db in ((0, 0), (1, 0), (1, 1), (0, 1)):
                q = index.get(tuple(c - da * e_u - db * e_w))
                if q is None:
                    ok = False
                    break
                quad.append(q)
            if not ok:
                continue
            a, b_, cq, dq = quad
            if sdf[i] > 0:  # orient consistently with the field gradient
                faces.append((a, b_, cq))
                faces.append((a, cq, dq))
            else:
                faces.append((a, cq, b_))
                faces.append((a, dq, cq))

    return verts, np.asarray(faces, np.int32).reshape(-1, 3)


def dual_grid_mesh(field: Voxels) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batched extraction from decoder output voxels whose features are
    [sdf, ox, oy, oz]. Returns a list of (vertices, faces) per scene."""
    out = []
    coords = np.asarray(field.coords)
    feats = np.asarray(field.features)
    nv = np.asarray(field.num_valid)
    for i in range(field.batch_size):
        k = int(nv[i])
        out.append(
            dual_grid_mesh_single(
                coords[i, :k], feats[i, :k, 0], feats[i, :k, 1:4]
            )
        )
    return out
