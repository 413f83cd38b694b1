from nndetection_tpu.evaluator.coco import COCOMetric
from nndetection_tpu.evaluator.froc import FROCMetric
from nndetection_tpu.evaluator.det import BoxEvaluator, SegmentationEvaluator
from nndetection_tpu.evaluator.case import CaseEvaluator
from nndetection_tpu.evaluator.hist import PredictionHistogram
from nndetection_tpu.evaluator.matching import matching_batch
from nndetection_tpu.evaluator.registry import evaluate_box_dir, evaluate_seg_dir

__all__ = [
    "COCOMetric",
    "FROCMetric",
    "BoxEvaluator",
    "SegmentationEvaluator",
    "CaseEvaluator",
    "PredictionHistogram",
    "matching_batch",
    "evaluate_box_dir",
    "evaluate_seg_dir",
]
