"""Point-cloud augmentation transforms (host-side numpy).

Rebuilds the reference augmentation suite
(``warpconvnet/dataset/transforms.py``: chromatic jitter / autocontrast /
drop, random dropout / flip / scale / rotation / translation, elastic
distortion, hue-saturation translation). These run in the input pipeline on
the host — they are deliberately numpy, not JAX: augmentation happens while
the TPU computes the previous step.

Each transform maps a dict sample ``{"coords": [N,3] float, "colors": [N,3]
float in [0,1] (optional), "labels": [N] (optional), ...}`` to the same
structure. ``Compose`` chains them.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

Sample = Dict[str, np.ndarray]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Sample, rng: Optional[np.random.Generator] = None) -> Sample:
        rng = rng or np.random.default_rng()
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class RandomDropout:
    """Randomly drop a fraction of points."""

    def __init__(self, dropout_ratio: float = 0.2, p: float = 0.5):
        self.dropout_ratio = dropout_ratio
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if rng.uniform() > self.p:
            return sample
        n = len(sample["coords"])
        keep = rng.uniform(size=n) > self.dropout_ratio
        if not keep.any():
            keep[0] = True
        return {
            k: (v[keep] if isinstance(v, np.ndarray) and len(v) == n else v)
            for k, v in sample.items()
        }


class RandomFlip:
    """Flip each horizontal axis independently with probability p."""

    def __init__(self, axes: Sequence[int] = (0, 1), p: float = 0.5):
        self.axes = axes
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        coords = sample["coords"].copy()
        for ax in self.axes:
            if rng.uniform() < self.p:
                coords[:, ax] = -coords[:, ax]
        return {**sample, "coords": coords}


class RandomRotation:
    """Rotate about each axis by a uniform angle within per-axis bounds
    (radians). Default: full yaw, small roll/pitch — the ScanNet recipe."""

    def __init__(
        self,
        angle_bounds: Sequence[float] = (np.pi / 32, np.pi / 32, np.pi),
        p: float = 0.95,
    ):
        self.angle_bounds = angle_bounds
        self.p = p

    @staticmethod
    def _axis_rot(axis: int, angle: float) -> np.ndarray:
        c, s = np.cos(angle), np.sin(angle)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c
        m[i, j] = -s if axis != 1 else s
        m[j, i] = s if axis != 1 else -s
        m[j, j] = c
        return m

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if rng.uniform() > self.p:
            return sample
        rot = np.eye(3)
        for ax, bound in enumerate(self.angle_bounds):
            ang = rng.uniform(-bound, bound)
            rot = rot @ self._axis_rot(ax, ang)
        coords = sample["coords"] @ rot.T
        out = {**sample, "coords": coords.astype(sample["coords"].dtype)}
        if "normals" in sample:
            out["normals"] = (sample["normals"] @ rot.T).astype(
                sample["normals"].dtype
            )
        return out


class RandomScale:
    def __init__(self, scale_range: Sequence[float] = (0.9, 1.1), p: float = 0.95):
        self.scale_range = scale_range
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if rng.uniform() > self.p:
            return sample
        s = rng.uniform(*self.scale_range)
        return {**sample, "coords": (sample["coords"] * s).astype(sample["coords"].dtype)}


class RandomTranslation:
    def __init__(self, bounds: float = 0.2, p: float = 0.95):
        self.bounds = bounds
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if rng.uniform() > self.p:
            return sample
        t = rng.uniform(-self.bounds, self.bounds, size=3)
        return {**sample, "coords": (sample["coords"] + t).astype(sample["coords"].dtype)}


class ElasticDistortion:
    """Smooth random displacement field applied to coordinates (the standard
    ScanNet elastic distortion: random noise on a coarse grid, tri-linearly
    blurred, interpolated at each point)."""

    def __init__(
        self,
        params: Sequence[Sequence[float]] = ((0.2, 0.4), (0.8, 1.6)),
        p: float = 0.95,
    ):
        self.params = params
        self.p = p

    @staticmethod
    def _distort(coords: np.ndarray, granularity: float, magnitude: float, rng) -> np.ndarray:
        lo = coords.min(0)
        dims = np.maximum(((coords - lo).max(0) // granularity).astype(int) + 3, 4)
        noise = rng.standard_normal(size=(*dims, 3)).astype(np.float32)
        # Tri-directional box blur x3 (approximates Gaussian smoothing).
        for _ in range(2):
            for ax in range(3):
                kshape = [1, 1, 1, 1]
                kshape[ax] = 3
                kernel = np.ones(kshape, np.float32) / 3
                from scipy.ndimage import convolve  # type: ignore

                noise = convolve(noise, kernel, mode="constant")
        idx = np.clip(((coords - lo) / granularity), 0, np.asarray(dims) - 1.001)
        i0 = idx.astype(int)
        frac = idx - i0
        disp = np.zeros_like(coords, np.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (frac[:, 0] if dx else 1 - frac[:, 0])
                        * (frac[:, 1] if dy else 1 - frac[:, 1])
                        * (frac[:, 2] if dz else 1 - frac[:, 2])
                    )
                    corner = noise[
                        np.minimum(i0[:, 0] + dx, dims[0] - 1),
                        np.minimum(i0[:, 1] + dy, dims[1] - 1),
                        np.minimum(i0[:, 2] + dz, dims[2] - 1),
                    ]
                    disp += corner * w[:, None]
        return coords + disp * magnitude

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if rng.uniform() > self.p:
            return sample
        try:
            import scipy.ndimage  # noqa: F401
        except ImportError:  # no scipy in the image -> skip gracefully
            return sample
        coords = sample["coords"].astype(np.float32)
        for granularity, magnitude in self.params:
            coords = self._distort(coords, granularity, magnitude, rng)
        return {**sample, "coords": coords}


# --- color transforms -------------------------------------------------------


class ChromaticJitter:
    def __init__(self, std: float = 0.01, p: float = 0.95):
        self.std = std
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if "colors" not in sample or rng.uniform() > self.p:
            return sample
        noise = rng.standard_normal(sample["colors"].shape) * self.std
        return {
            **sample,
            "colors": np.clip(sample["colors"] + noise, 0, 1).astype(np.float32),
        }


class ChromaticAutoContrast:
    def __init__(self, p: float = 0.2, blend_factor: Optional[float] = None):
        self.p = p
        self.blend_factor = blend_factor

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if "colors" not in sample or rng.uniform() > self.p:
            return sample
        colors = sample["colors"]
        lo, hi = colors.min(0, keepdims=True), colors.max(0, keepdims=True)
        scale = 1.0 / np.maximum(hi - lo, 1e-6)
        contrast = (colors - lo) * scale
        blend = self.blend_factor if self.blend_factor is not None else rng.uniform()
        return {
            **sample,
            "colors": ((1 - blend) * colors + blend * contrast).astype(np.float32),
        }


class ChromaticDropGray:
    """With probability p, replace colors by their gray level."""

    def __init__(self, p: float = 0.1):
        self.p = p

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if "colors" not in sample or rng.uniform() > self.p:
            return sample
        gray = sample["colors"].mean(-1, keepdims=True)
        return {**sample, "colors": np.repeat(gray, 3, axis=-1).astype(np.float32)}


class HueSaturationTranslation:
    def __init__(self, hue_max: float = 0.1, saturation_max: float = 0.2, p: float = 0.95):
        self.hue_max = hue_max
        self.saturation_max = saturation_max
        self.p = p

    @staticmethod
    def _rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
        maxc = rgb.max(-1)
        minc = rgb.min(-1)
        v = maxc
        delta = maxc - minc
        s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-9), 0)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        h = np.zeros_like(maxc)
        mask = delta > 0
        rmax = mask & (maxc == r)
        gmax = mask & (maxc == g) & ~rmax
        bmax = mask & ~rmax & ~gmax
        h = np.where(rmax, ((g - b) / np.maximum(delta, 1e-9)) % 6, h)
        h = np.where(gmax, (b - r) / np.maximum(delta, 1e-9) + 2, h)
        h = np.where(bmax, (r - g) / np.maximum(delta, 1e-9) + 4, h)
        return np.stack([h / 6.0, s, v], -1)

    @staticmethod
    def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
        h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
        i = np.floor(h).astype(int) % 6
        f = h - np.floor(h)
        p = v * (1 - s)
        q = v * (1 - s * f)
        t = v * (1 - s * (1 - f))
        table = np.stack(
            [
                np.stack([v, t, p], -1),
                np.stack([q, v, p], -1),
                np.stack([p, v, t], -1),
                np.stack([p, q, v], -1),
                np.stack([t, p, v], -1),
                np.stack([v, p, q], -1),
            ]
        )
        return table[i, np.arange(len(i))]

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if "colors" not in sample or rng.uniform() > self.p:
            return sample
        hsv = self._rgb_to_hsv(sample["colors"])
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-self.hue_max, self.hue_max)) % 1.0
        hsv[..., 1] = np.clip(
            hsv[..., 1] + rng.uniform(-self.saturation_max, self.saturation_max), 0, 1
        )
        return {**sample, "colors": self._hsv_to_rgb(hsv).astype(np.float32)}
