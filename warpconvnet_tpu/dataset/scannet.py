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
