"""Dataset + transform + collate tests (reference tests for
warpconvnet/dataset/)."""

import numpy as np

from warpconvnet_tpu.dataset import (
    ChromaticAutoContrast,
    ChromaticJitter,
    Compose,
    ElasticDistortion,
    HueSaturationTranslation,
    ModelNet40Dataset,
    RandomDropout,
    RandomFlip,
    RandomRotation,
    RandomScale,
    ScanNetDataset,
    collate_points,
    collate_voxels,
)


def _sample(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "coords": rng.standard_normal((n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(n, 3)).astype(np.float32),
        "labels": rng.integers(0, 20, n).astype(np.int32),
    }


def test_geometric_transforms_shapes_and_effects():
    rng = np.random.default_rng(0)
    s = _sample()
    out = RandomRotation(p=1.0)(s, rng)
    assert out["coords"].shape == s["coords"].shape
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(out["coords"], axis=1),
        np.linalg.norm(s["coords"], axis=1),
        rtol=1e-4,
    )
    out = RandomScale((2.0, 2.0), p=1.0)(s, rng)
    np.testing.assert_allclose(out["coords"], s["coords"] * 2.0, rtol=1e-6)
    out = RandomFlip(p=1.0)(s, rng)
    np.testing.assert_allclose(np.abs(out["coords"]), np.abs(s["coords"]), rtol=1e-6)
    out = RandomDropout(0.5, p=1.0)(s, rng)
    assert len(out["coords"]) < len(s["coords"])
    assert len(out["labels"]) == len(out["coords"])


def test_color_transforms_stay_in_range():
    rng = np.random.default_rng(1)
    s = _sample()
    for t in (
        ChromaticJitter(p=1.0),
        ChromaticAutoContrast(p=1.0),
        HueSaturationTranslation(p=1.0),
    ):
        out = t(s, rng)
        assert out["colors"].min() >= -1e-6 and out["colors"].max() <= 1 + 1e-6
        assert out["colors"].shape == s["colors"].shape


def test_compose_and_elastic():
    rng = np.random.default_rng(2)
    pipeline = Compose([RandomRotation(p=1.0), ElasticDistortion(p=1.0)])
    out = pipeline(_sample(), rng)
    assert out["coords"].shape == (1000, 3)
    assert np.isfinite(out["coords"]).all()


def test_modelnet_synthetic():
    ds = ModelNet40Dataset(split="train", num_points=512, synthetic_size=50)
    assert ds.synthetic and len(ds) == 50
    s = ds[0]
    assert s["coords"].shape == (512, 3)
    # determinism
    np.testing.assert_array_equal(ds[3]["coords"], ds[3]["coords"])
    labels = {ds[i]["label"] for i in range(50)}
    assert len(labels) > 5


def test_scannet_synthetic_and_collate_voxels():
    ds = ScanNetDataset(synthetic_size=4, synthetic_points=5000)
    s0, s1 = ds[0], ds[1]
    assert s0["coords"].shape[1] == 3 and (s0["labels"] >= 0).all()
    vox, labels = collate_voxels([s0, s1], voxel_size=0.05)
    b, n, _ = vox.coords.shape
    assert b == 2 and labels.shape == (2, n)
    nv = np.asarray(vox.num_valid)
    assert (nv > 100).all() and (nv <= n).all()
    # padding labels are ignore
    assert (labels[0, nv[0]:] == -100).all()


def test_collate_points_bucketing():
    samples = [
        {"coords": np.zeros((700, 3), np.float32)},
        {"coords": np.zeros((1500, 3), np.float32)},
    ]
    pts, labels = collate_points(samples, bucket=1024)
    assert pts.coords.shape[1] % 1024 == 0
    assert labels is None
    assert list(np.asarray(pts.num_valid)) == [700, 1500]


def test_scannet_instance_synthetic():
    """ScanNetInstanceDataset (reference dataset/scannet.py:151): synthetic
    instance rooms carry consistent (segment, instance) labels; stuff
    classes (floor/walls) have instance -1 but valid segments."""
    from warpconvnet_tpu.dataset import ScanNetInstanceDataset

    ds = ScanNetInstanceDataset(
        label_set="scannet20", synthetic_size=3, synthetic_points=6000
    )
    assert ds.num_classes == 20
    s = ds[0]
    n = len(s["coords"])
    for k in ("colors", "normals", "segment", "instance"):
        assert len(s[k]) == n, k
    inst = s["instance"]
    seg = s["segment"]
    assert (inst >= 0).any() and (inst == -1).any()
    # every real instance has exactly one (majority) semantic class >= 0
    for i in np.unique(inst[inst >= 0]):
        assert (seg[inst == i] >= 0).all()
    # stuff rows: valid segment, no instance
    assert ((inst == -1) & (seg >= 0)).any()
    # determinism
    np.testing.assert_array_equal(ds[1]["instance"], ds[1]["instance"])


def test_scannet200_constants_tables():
    from warpconvnet_tpu.dataset import (
        CLASS_LABELS_20,
        CLASS_LABELS_200,
        VALID_CLASS_IDS_20,
        VALID_CLASS_IDS_200,
    )

    assert len(CLASS_LABELS_20) == len(VALID_CLASS_IDS_20) == 20
    assert len(CLASS_LABELS_200) == len(VALID_CLASS_IDS_200) == 200
    assert len(set(VALID_CLASS_IDS_200)) == 200  # ids unique


def test_voxel_downsample_np_first_occurrence():
    from warpconvnet_tpu.dataset import voxel_downsample_np

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    q, keep = voxel_downsample_np(pts, 0.1)
    assert len(q) == len(keep) and len(q) < len(pts)
    # kept points quantize to their voxel and voxels are unique
    np.testing.assert_array_equal(
        np.floor(pts[keep] / 0.1).astype(np.int32), q
    )
    assert len(np.unique(q, axis=0)) == len(q)
