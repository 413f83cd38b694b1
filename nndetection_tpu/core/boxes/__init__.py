from nndetection_tpu.core.boxes.ops import (
    box_area,
    box_center,
    box_center_dist,
    box_iou,
    box_iou_union,
    box_size,
    center_in_boxes,
    clip_boxes_to_image,
    expand_to_boxes,
    generalized_box_iou,
    permute_boxes,
    small_boxes_mask,
)
from nndetection_tpu.core.boxes import ops_np
from nndetection_tpu.core.boxes.coder import BoxCoder
from nndetection_tpu.core.boxes.anchors import AnchorGenerator, compute_anchors_for_strides
from nndetection_tpu.core.boxes.matcher import ATSSMatcher, IoUMatcher, MatchResult
from nndetection_tpu.core.boxes.sampler import (
    HardNegativeSamplerBatched,
    BalancedHardNegativeSampler,
    HardNegativeSamplerFgAll,
)
from nndetection_tpu.core.boxes.nms import nms_mask, batched_nms_mask, topk_nms
from nndetection_tpu.core.boxes.wbc import wbc, batched_wbc

__all__ = [
    "box_area",
    "box_center",
    "box_center_dist",
    "box_iou",
    "box_iou_union",
    "box_size",
    "center_in_boxes",
    "clip_boxes_to_image",
    "expand_to_boxes",
    "generalized_box_iou",
    "permute_boxes",
    "small_boxes_mask",
    "ops_np",
    "BoxCoder",
    "AnchorGenerator",
    "compute_anchors_for_strides",
    "ATSSMatcher",
    "IoUMatcher",
    "MatchResult",
    "HardNegativeSamplerBatched",
    "BalancedHardNegativeSampler",
    "HardNegativeSamplerFgAll",
    "nms_mask",
    "batched_nms_mask",
    "topk_nms",
    "wbc",
    "batched_wbc",
]
