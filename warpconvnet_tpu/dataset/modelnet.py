"""ModelNet40 dataset (reference ``warpconvnet/dataset/modelnet.py:63``
``ModelNet40Dataset`` — auto-download + h5 point clouds).

This environment has no egress, so the loader reads pre-downloaded ``.npz``
shards (``{root}/modelnet40_{split}.npz`` with arrays ``points [S, N, 3]``
and ``labels [S]``) and falls back to a deterministic synthetic set of
parametric shapes when no data is on disk — keeping the example training
scripts and tests hermetic. The synthetic mode is clearly flagged.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

MODELNET40_CLASSES = 40


def _synthetic_shape(rng: np.random.Generator, label: int, n: int) -> np.ndarray:
    """Parametric point-cloud families keyed by label (sphere/box/cylinder/
    cone/torus, rotated + scaled) — enough structure for a classifier to
    learn, entirely offline."""
    kind = label % 5
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(-1, 1, n)
    if kind == 0:  # sphere
        phi = np.arccos(v)
        pts = np.stack(
            [np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u), np.cos(phi)], -1
        )
    elif kind == 1:  # box surface
        pts = rng.uniform(-1, 1, (n, 3))
        ax = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), ax] = sign
    elif kind == 2:  # cylinder
        pts = np.stack([np.cos(u), np.sin(u), v], -1)
    elif kind == 3:  # cone
        r = (1 - (v + 1) / 2)
        pts = np.stack([r * np.cos(u), r * np.sin(u), v], -1)
    else:  # torus
        w = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack(
            [
                (1 + 0.4 * np.cos(w)) * np.cos(u),
                (1 + 0.4 * np.cos(w)) * np.sin(u),
                0.4 * np.sin(w),
            ],
            -1,
        )
    # Deterministic per-class anisotropic scale makes the 40 labels separable.
    scale = 0.5 + 0.5 * np.array(
        [1 + (label % 7) / 7, 1 + (label % 11) / 11, 1 + (label % 13) / 13]
    )
    pts = pts * scale
    # random rotation about z
    ang = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return (pts @ rot.T).astype(np.float32)


class ModelNet40Dataset:
    """Map-style dataset yielding ``{"coords": [N,3] float32, "label": int}``."""

    def __init__(
        self,
        root: Optional[str] = None,
        split: str = "train",
        num_points: int = 2048,
        synthetic_size: int = 2000,
        seed: int = 0,
    ):
        self.split = split
        self.num_points = num_points
        self.synthetic = True
        self._points: Optional[np.ndarray] = None
        self._labels: Optional[np.ndarray] = None
        if root is not None:
            path = os.path.join(root, f"modelnet40_{split}.npz")
            if os.path.exists(path):
                blob = np.load(path)
                self._points = blob["points"]
                self._labels = blob["labels"]
                self.synthetic = False
        if self.synthetic:
            rng = np.random.default_rng(seed + (0 if split == "train" else 1))
            self._labels = rng.integers(0, MODELNET40_CLASSES, synthetic_size).astype(
                np.int64
            )
            self._seed = seed

    def __len__(self) -> int:
        return len(self._labels)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        label = int(self._labels[i])
        if self.synthetic:
            rng = np.random.default_rng(self._seed * 1_000_003 + i)
            pts = _synthetic_shape(rng, label, self.num_points)
        else:
            pts = self._points[i][: self.num_points].astype(np.float32)
        return {"coords": pts, "label": label}
