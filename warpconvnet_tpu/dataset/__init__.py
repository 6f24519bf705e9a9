from warpconvnet_tpu.dataset.transforms import (
    ChromaticAutoContrast,
    ChromaticJitter,
    ChromaticDropGray,
    Compose,
    ElasticDistortion,
    HueSaturationTranslation,
    RandomDropout,
    RandomFlip,
    RandomRotation,
    RandomScale,
    RandomTranslation,
)
from warpconvnet_tpu.dataset.collate import collate_points, collate_voxels
from warpconvnet_tpu.dataset.modelnet import ModelNet40Dataset
from warpconvnet_tpu.dataset.scannet import ScanNetDataset, SCANNET20_CLASSES
