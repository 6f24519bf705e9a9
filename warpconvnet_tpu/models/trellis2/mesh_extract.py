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


def flexi_dual_grid_mesh_single(
    coords: np.ndarray,
    vertices: np.ndarray,
    intersected: np.ndarray,
    quad_lerp: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """One scene, the published FlexiDualGrid attribute convention
    (reference ``FlexiDualGridVaeDecoder.decode_attrs``, shape_vae.py:300):

    coords [N,3] int; vertices [N,3] in [-margin, 1+margin] voxel units
    (voxel-local); intersected [N,3] bool — axis-d edge from v to v+e_d
    crosses the surface; quad_lerp [N,1] positive quad weights.

    Each intersected edge emits the quad of the 4 voxels sharing it,
    triangulated along the diagonal with the larger summed quad_lerp (the
    upstream o-voxel extractor's weight-guided split), wound around +d.
    """
    index = {tuple(c): i for i, c in enumerate(map(tuple, coords))}
    verts = coords.astype(np.float32) + vertices.astype(np.float32)
    ql = quad_lerp.reshape(-1)
    faces: List[Tuple[int, int, int]] = []

    for d, u, w in _AXES:
        e_u = np.zeros(3, np.int64)
        e_u[u] = 1
        e_w = np.zeros(3, np.int64)
        e_w[w] = 1
        for i, c in enumerate(coords):
            if not intersected[i, d]:
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
            if ql[a] + ql[cq] >= ql[b_] + ql[dq]:
                faces.append((a, b_, cq))
                faces.append((a, cq, dq))
            else:
                faces.append((b_, cq, dq))
                faces.append((b_, dq, a))

    return verts, np.asarray(faces, np.int32).reshape(-1, 3)


def flexi_dual_grid_mesh(
    vertices: Voxels, intersected: Voxels, quad_lerp: Voxels
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batched extraction from :meth:`ShapeVaeDecoder.decode_attrs` outputs."""
    out = []
    coords = np.asarray(vertices.coords)
    v = np.asarray(vertices.features)
    it = np.asarray(intersected.features)
    qlf = np.asarray(quad_lerp.features)
    nv = np.asarray(vertices.num_valid)
    for i in range(vertices.batch_size):
        k = int(nv[i])
        out.append(
            flexi_dual_grid_mesh_single(
                coords[i, :k], v[i, :k], it[i, :k], qlf[i, :k]
            )
        )
    return out
