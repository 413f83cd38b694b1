from nndetection_tpu.ops.native import (
    HAS_NATIVE,
    coco_match_native,
    iou_matrix_native,
    nms_native,
    wbc_native,
)

__all__ = [
    "HAS_NATIVE",
    "coco_match_native",
    "iou_matrix_native",
    "nms_native",
    "wbc_native",
]
