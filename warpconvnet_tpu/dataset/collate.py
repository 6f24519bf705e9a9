"""Collation: ragged host samples -> padded device batches.

The TPU-side analog of the reference's list-collate (the reference keeps
ragged concatenated tensors; we pad to static bucketed capacities so every
training step hits the same compiled program — SURVEY.md section 7's
"padded buckets" recipe).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from warpconvnet_tpu.geometry.batched import round_up_bucket
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _pad_batch(arrays: Sequence[np.ndarray], cap: int, fill) -> np.ndarray:
    b = len(arrays)
    out = np.full((b, cap) + arrays[0].shape[1:], fill, arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : len(a)] = a[:cap]
    return out


def collate_points(
    samples: List[Dict[str, np.ndarray]],
    capacity: Optional[int] = None,
    bucket: int = 1024,
    label_ignore: int = -100,
):
    """Collate samples with float 'coords' (+optional 'features'/'colors',
    'labels') into a :class:`Points` batch + padded labels.

    Capacity defaults to the bucket-rounded max sample size, bounding the
    number of distinct compiled shapes (the reference's log-binned configs).
    """
    n_max = max(len(s["coords"]) for s in samples)
    cap = capacity or round_up_bucket(n_max, bucket)
    coords = _pad_batch([s["coords"].astype(np.float32) for s in samples], cap, 0.0)
    feats_key = "features" if "features" in samples[0] else (
        "colors" if "colors" in samples[0] else None
    )
    if feats_key is None:
        feats = np.ones((len(samples), cap, 1), np.float32)
        for i, s in enumerate(samples):
            feats[i, len(s["coords"]):] = 0
    else:
        feats = _pad_batch(
            [s[feats_key].astype(np.float32) for s in samples], cap, 0.0
        )
    nv = np.asarray([min(len(s["coords"]), cap) for s in samples], np.int32)
    pts = Points.create(coords, feats, nv)
    labels = None
    if "labels" in samples[0]:
        labels = _pad_batch(
            [s["labels"].astype(np.int32) for s in samples], cap, label_ignore
        )
    return pts, labels


def collate_voxels(
    samples: List[Dict[str, np.ndarray]],
    voxel_size: float,
    capacity: Optional[int] = None,
    bucket: int = 1024,
    label_ignore: int = -100,
):
    """Voxelize each sample on the host (floor-div + np.unique) and collate
    into a :class:`Voxels` batch.

    Host-side voxelization matches the reference's numpy data-loading variant
    (``coords/ops/voxel.py`` numpy path): dedup happens in the input pipeline
    so the device sees already-unique coords.
    """
    from warpconvnet_tpu import native

    use_native = native.is_available()
    vox_coords, vox_feats, vox_labels = [], [], []
    has_labels = "labels" in samples[0]
    for s in samples:
        if use_native:
            # C++/OpenMP host voxelizer (csrc/host_coords.cpp) — the input
            # pipeline overlaps this with device compute.
            uniq, idx = native.voxelize(
                np.ascontiguousarray(s["coords"], np.float32), voxel_size
            )
        else:
            disc = np.floor(s["coords"] / voxel_size).astype(np.int32)
            uniq, idx = np.unique(disc, axis=0, return_index=True)
        vox_coords.append(uniq)
        feats_key = "features" if "features" in s else (
            "colors" if "colors" in s else None
        )
        if feats_key is None:
            vox_feats.append(np.ones((len(uniq), 1), np.float32))
        else:
            vox_feats.append(s[feats_key][idx].astype(np.float32))
        if has_labels:
            vox_labels.append(s["labels"][idx].astype(np.int32))

    n_max = max(len(c) for c in vox_coords)
    cap = capacity or round_up_bucket(n_max, bucket)
    coords = _pad_batch(vox_coords, cap, PAD_COORD)
    feats = _pad_batch(vox_feats, cap, 0.0)
    nv = np.asarray([min(len(c), cap) for c in vox_coords], np.int32)
    vox = Voxels.create(coords, feats, nv, voxel_size=voxel_size)
    labels = (
        _pad_batch(vox_labels, cap, label_ignore) if has_labels else None
    )
    return vox, labels
