"""ScanNet semantic-segmentation dataset (reference
``warpconvnet/dataset/scannet.py:37`` ``ScanNetDataset``,
``ScanNetInstanceDataset:151``).

Reads prepared per-scene ``.npz`` files (``coords [N,3] float32``,
``colors [N,3] float32 in [0,1]``, ``labels [N] int``) from
``{root}/{split}/*.npz``. With no data on disk it synthesizes room-like
scenes (floor + walls + random boxes with per-surface labels) so the example
pipeline runs offline; synthetic mode is flagged on the instance.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

SCANNET20_CLASSES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]


def _synthetic_room(rng: np.random.Generator, n_target: int) -> Dict[str, np.ndarray]:
    sx, sy, sz = rng.uniform(3, 8), rng.uniform(3, 8), rng.uniform(2.2, 3.2)
    pts: List[np.ndarray] = []
    labels: List[np.ndarray] = []

    def add(p, lbl):
        pts.append(p)
        labels.append(np.full(len(p), lbl, np.int32))

    n_floor = n_target // 4
    add(
        np.stack(
            [rng.uniform(0, sx, n_floor), rng.uniform(0, sy, n_floor),
             np.zeros(n_floor)], -1
        ),
        1,  # floor
    )
    n_wall = n_target // 8
    for wall in range(4):
        if wall < 2:
            p = np.stack(
                [np.full(n_wall, 0.0 if wall == 0 else sx),
                 rng.uniform(0, sy, n_wall), rng.uniform(0, sz, n_wall)], -1
            )
        else:
            p = np.stack(
                [rng.uniform(0, sx, n_wall),
                 np.full(n_wall, 0.0 if wall == 2 else sy),
                 rng.uniform(0, sz, n_wall)], -1
            )
        add(p, 0)  # wall
    n_boxes = rng.integers(2, 6)
    remaining = n_target - n_floor - 4 * n_wall
    for _ in range(n_boxes):
        m = remaining // n_boxes
        center = np.array([rng.uniform(0.5, sx - 0.5), rng.uniform(0.5, sy - 0.5), 0])
        size = rng.uniform(0.3, 1.2, 3)
        p = center + rng.uniform(0, 1, (m, 3)) * size
        add(p, int(rng.integers(2, 20)))
    coords = np.concatenate(pts).astype(np.float32)
    labels = np.concatenate(labels)
    colors = np.clip(
        0.3 + 0.1 * labels[:, None] / 20 + rng.normal(0, 0.05, (len(coords), 3)),
        0, 1,
    ).astype(np.float32)
    return {"coords": coords, "colors": colors, "labels": labels}


def voxel_downsample_np(coords: np.ndarray, voxel_size: float):
    """Host-side voxel downsample (reference
    ``geometry/coords/ops/voxel.py`` ``voxel_downsample_np``): quantize to
    ``voxel_size``, keep the first point of every occupied voxel. Returns
    ``(int_coords [M,3] int32, keep_indices [M] int64)`` where
    ``keep_indices`` selects representative points in the original array.
    Meant for CPU dataloader workers, not the device path."""
    q = np.floor(coords / voxel_size).astype(np.int64)
    # lexicographic unique; return_index gives the first occurrence
    _, keep = np.unique(
        (q - q.min(0)) @ np.array(
            [(q.max(0) - q.min(0) + 1)[1:].prod(), q.max(0)[2] - q.min(0)[2] + 1, 1],
            np.int64,
        ),
        return_index=True,
    )
    keep = np.sort(keep)
    return q[keep].astype(np.int32), keep


class ScanNetDataset:
    """Map-style dataset yielding ``{"coords", "colors", "labels"}``."""

    num_classes = 20
    ignore_label = -100

    def __init__(
        self,
        root: Optional[str] = None,
        split: str = "train",
        transform=None,
        synthetic_size: int = 100,
        synthetic_points: int = 80_000,
        seed: int = 0,
    ):
        self.transform = transform
        self.files: List[str] = []
        self.synthetic = True
        if root is not None:
            self.files = sorted(glob.glob(os.path.join(root, split, "*.npz")))
            self.synthetic = not self.files
        self._synthetic_size = synthetic_size
        self._synthetic_points = synthetic_points
        self._seed = seed + (0 if split == "train" else 7)

    def __len__(self) -> int:
        return len(self.files) if not self.synthetic else self._synthetic_size

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.synthetic:
            rng = np.random.default_rng(self._seed * 999_983 + i)
            sample = _synthetic_room(rng, self._synthetic_points)
        else:
            blob = np.load(self.files[i])
            sample = {
                "coords": blob["coords"].astype(np.float32),
                "colors": blob["colors"].astype(np.float32),
                "labels": blob["labels"].astype(np.int32),
            }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample

def _synthetic_instance_room(
    rng: np.random.Generator, n_target: int
) -> Dict[str, np.ndarray]:
    """Room with per-box instance ids: floor/walls get instance -1 (stuff);
    each box is one instance with a random semantic class."""
    base = _synthetic_room(rng, n_target)
    coords, labels = base["coords"], base["labels"]
    instance = np.full(len(coords), -1, np.int32)
    # _synthetic_room appends boxes last with labels >= 2; group contiguous
    # equal-label runs in the box region into instances.
    box_mask = labels >= 2
    idx = np.flatnonzero(box_mask)
    if len(idx):
        run_start = np.flatnonzero(
            np.r_[True, labels[idx][1:] != labels[idx][:-1]]
        )
        run_id = np.zeros(len(idx), np.int32)
        run_id[run_start] = 1
        instance[idx] = np.cumsum(run_id) - 1
    normals = np.zeros_like(coords)
    normals[:, 2] = 1.0
    return {
        "coords": coords,
        "colors": base["colors"],
        "normals": normals,
        "segment": labels.astype(np.int32),
        "instance": instance,
    }


class ScanNetInstanceDataset:
    """ScanNet / ScanNet200 instance + semantic segmentation dataset
    (reference ``warpconvnet/dataset/scannet.py:151``).

    Reads the Pointcept-style preprocessed per-scene layout::

        {root}/{split}/{scene}/{coord,color,normal,segment20,segment200,
                                instance}.npy

    and yields ``{"name", "coords", "colors", "normals", "segment",
    "instance"}`` with ``-1`` as the ignore/stuff id. ``label_set`` selects
    the 20- or 200-class semantic annotation (official id tables in
    :mod:`warpconvnet_tpu.dataset.scannet200_constants`). With no data on
    disk it synthesizes instance-labelled rooms so the MaskFormer /
    SpaCeFormerInstanceSeg examples run offline.
    """

    NUM_CLASSES = {"scannet20": 20, "scannet200": 200}
    IGNORE_INDEX = -1

    def __init__(
        self,
        root: Optional[str] = None,
        split: str = "train",
        label_set: str = "scannet200",
        voxel_size: Optional[float] = None,
        transform=None,
        synthetic_size: int = 100,
        synthetic_points: int = 80_000,
        seed: int = 0,
    ):
        if label_set not in self.NUM_CLASSES:
            raise ValueError(
                f"label_set must be one of {sorted(self.NUM_CLASSES)}, got {label_set!r}"
            )
        from warpconvnet_tpu.dataset.scannet200_constants import (
            VALID_CLASS_IDS_20,
            VALID_CLASS_IDS_200,
        )

        self.label_set = label_set
        self.num_classes = self.NUM_CLASSES[label_set]
        self.class2id = np.asarray(
            VALID_CLASS_IDS_20 if label_set == "scannet20" else VALID_CLASS_IDS_200,
            np.int32,
        )
        self._segment_asset = "segment20" if label_set == "scannet20" else "segment200"
        self.voxel_size = voxel_size
        self.transform = transform
        self.scenes: List[str] = []
        self.synthetic = True
        if root is not None:
            root = os.path.abspath(os.path.expanduser(root))
            splits = [split] if isinstance(split, str) else list(split)
            for s in splits:
                self.scenes.extend(sorted(glob.glob(os.path.join(root, s, "*"))))
            self.scenes = [s for s in self.scenes if os.path.isdir(s)]
            self.synthetic = not self.scenes
        self._synthetic_size = synthetic_size
        self._synthetic_points = synthetic_points
        self._seed = seed + (0 if split == "train" else 7)

    def __len__(self) -> int:
        return len(self.scenes) if not self.synthetic else self._synthetic_size

    def _load_scene(self, scene_dir: str) -> Dict[str, np.ndarray]:
        raw = {
            f[:-4]: np.load(os.path.join(scene_dir, f))
            for f in os.listdir(scene_dir)
            if f.endswith(".npy")
        }
        coords = raw["coord"].astype(np.float32)
        n = len(coords)

        def field(key, fallback):
            v = raw.get(key)
            return v if v is not None else fallback

        return {
            "name": os.path.basename(scene_dir),
            "coords": coords,
            "colors": field("color", np.zeros_like(coords)).astype(np.float32),
            "normals": field("normal", np.zeros_like(coords)).astype(np.float32),
            "segment": field(
                self._segment_asset, np.full(n, self.IGNORE_INDEX)
            ).reshape(-1).astype(np.int32),
            "instance": field("instance", np.full(n, self.IGNORE_INDEX))
            .reshape(-1)
            .astype(np.int32),
        }

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.synthetic:
            rng = np.random.default_rng(self._seed * 999_983 + i)
            sample = _synthetic_instance_room(rng, self._synthetic_points)
            sample["name"] = f"synthetic_{i:04d}"
        else:
            sample = self._load_scene(self.scenes[i])
        if self.voxel_size is not None:
            _, keep = voxel_downsample_np(sample["coords"], self.voxel_size)
            for k in ("coords", "colors", "normals", "segment", "instance"):
                sample[k] = sample[k][keep]
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
