from nndetection_tpu.models.retina_unet import (
    RetinaUNet,
    RetinaUNetConfig,
    assign_targets,
    batched_postprocess,
    postprocess_detections,
    train_step_loss,
)
from nndetection_tpu.models.encoder import Encoder, encoder_channels, encoder_strides
from nndetection_tpu.models.decoder import UFPN, ufpn_out_channels
from nndetection_tpu.models.heads import Classifier, Regressor, Segmenter

__all__ = [
    "RetinaUNet",
    "RetinaUNetConfig",
    "assign_targets",
    "batched_postprocess",
    "postprocess_detections",
    "train_step_loss",
    "Encoder",
    "encoder_channels",
    "encoder_strides",
    "UFPN",
    "ufpn_out_channels",
    "Classifier",
    "Regressor",
    "Segmenter",
]
