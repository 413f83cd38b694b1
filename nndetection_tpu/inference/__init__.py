from nndetection_tpu.inference.predictor import ModelBundle, Predictor
from nndetection_tpu.inference.ensembler import (
    BOX_ENSEMBLERS,
    BoxEnsemblerFastest,
    BoxEnsemblerLW,
    BoxEnsemblerSelective,
    BoxEnsemblerWBC,
    SegmentationEnsembler,
)
from nndetection_tpu.inference.restore import restore_detection, restore_fmap
from nndetection_tpu.inference.sweeper import BoxSweeper
from nndetection_tpu.inference.loading import (
    load_all_models,
    load_final_model,
    load_model_bundle,
)
from nndetection_tpu.inference.tta import get_tta_flips, flip_image, invert_boxes

__all__ = [
    "ModelBundle",
    "Predictor",
    "BOX_ENSEMBLERS",
    "BoxEnsemblerFastest",
    "BoxEnsemblerLW",
    "BoxEnsemblerSelective",
    "BoxEnsemblerWBC",
    "SegmentationEnsembler",
    "restore_detection",
    "restore_fmap",
    "BoxSweeper",
    "load_all_models",
    "load_final_model",
    "load_model_bundle",
    "get_tta_flips",
    "flip_image",
    "invert_boxes",
]
