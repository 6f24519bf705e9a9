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
from warpconvnet_tpu.dataset.scannet import (
    SCANNET20_CLASSES,
    ScanNetDataset,
    ScanNetInstanceDataset,
    voxel_downsample_np,
)
from warpconvnet_tpu.dataset.scannet200_constants import (
    CLASS_LABELS_20,
    CLASS_LABELS_200,
    VALID_CLASS_IDS_20,
    VALID_CLASS_IDS_200,
)
