from nndetection_tpu.data import nifti
from nndetection_tpu.data.dataset import Case, DatasetInfo, discover_cases, get_task_dir
from nndetection_tpu.data.crop import crop_to_nonzero
from nndetection_tpu.data.resample import resample_patient
from nndetection_tpu.data.normalize import normalize_case
from nndetection_tpu.data.augment import AugmentConfig, augment_batch, get_generator_patch_size
from nndetection_tpu.data.gt_prep import prepare_targets
from nndetection_tpu.data.loader import CaseRecord, PatchLoader, PrefetchIterator, build_case_records
from nndetection_tpu.data.patching import compute_grid, pad_to_min_shape, tile_weight_map

__all__ = [
    "nifti",
    "Case",
    "DatasetInfo",
    "discover_cases",
    "get_task_dir",
    "crop_to_nonzero",
    "resample_patient",
    "normalize_case",
    "AugmentConfig",
    "augment_batch",
    "get_generator_patch_size",
    "prepare_targets",
    "CaseRecord",
    "PatchLoader",
    "PrefetchIterator",
    "build_case_records",
    "compute_grid",
    "pad_to_min_shape",
    "tile_weight_map",
]
