"""Model-family registry: named module variants mapping a Plan to a
``RetinaUNetConfig`` (the reference's ``MODULE_REGISTRY`` mechanism,
``/root/reference/nndet/ptmodule/retinaunet/v001.py:29-38``).
"""
from __future__ import annotations

from typing import Any, Dict

from nndetection_tpu.models.retina_unet import RetinaUNetConfig
from nndetection_tpu.utils.registry import MODULE_REGISTRY


class BaseModule:
    """One entry = the class wiring of a published model variant."""

    config_overrides: Dict[str, Any] = {}

    @classmethod
    def model_config(cls, plan, **overrides) -> RetinaUNetConfig:
        merged = dict(cls.config_overrides)
        merged.update(overrides)
        return plan.model_config(**merged)


@MODULE_REGISTRY.register(name="RetinaUNetV001")
class RetinaUNetV001(BaseModule):
    """Published default: ATSS + sigmoid BCE + GIoU + HNM + FgBg segmenter."""

    config_overrides = {
        "matcher_type": "atss",
        "cls_loss_type": "bce",
        "reg_loss_type": "giou",
        "segmenter_fg_bg": True,
    }


@MODULE_REGISTRY.register(name="RetinaUNetV000")
class RetinaUNetV000(BaseModule):
    """The reference's *base* wiring (``ptmodule/retinaunet/base.py:74-86``):
    IoU matcher + class-weighted softmax-CE classifier + smooth-L1 regressor
    + HNM + multi-class DiCE segmenter. ``class_weights`` flow in from the
    plan (frequency-balanced, ``architecture/boxes/base.py:228-248``)."""

    config_overrides = {
        "matcher_type": "iou",
        "cls_loss_type": "ce",
        "reg_loss_type": "l1",
        "segmenter_fg_bg": False,
    }


@MODULE_REGISTRY.register(name="RetinaUNetV001RegAll")
class RetinaUNetV001RegAll(BaseModule):
    """V001 ablation: regression over ALL positives instead of the HNM-sampled
    subset (reference ``DetectionHeadHNMNativeRegAll``, ``comb.py:408-466``)."""

    config_overrides = {
        "matcher_type": "atss",
        "cls_loss_type": "bce",
        "reg_loss_type": "giou",
        "segmenter_fg_bg": True,
        "head_type": "hnm_reg_all",
    }


@MODULE_REGISTRY.register(name="RetinaUNetV001NoSampler")
class RetinaUNetV001NoSampler(BaseModule):
    """V001 ablation without hard-negative mining: every non-ignore anchor in
    the classification loss (reference ``BoxHeadNoSampler``, ``comb.py:279-348``)."""

    config_overrides = {
        "matcher_type": "atss",
        "cls_loss_type": "bce",
        "reg_loss_type": "giou",
        "segmenter_fg_bg": True,
        "head_type": "no_sampler",
    }


@MODULE_REGISTRY.register(name="RetinaUNetV002")
class RetinaUNetV002(BaseModule):
    """Focal-loss variant (no label smoothing), ATSS + GIoU."""

    config_overrides = {
        "matcher_type": "atss",
        "cls_loss_type": "focal",
        "reg_loss_type": "giou",
    }


@MODULE_REGISTRY.register(name="RetinaUNetV001TopK")
class RetinaUNetV001TopK(BaseModule):
    """V001 with the Dice+TopK-CE segmentation loss (the reference's
    ``DiceTopKSegmenter`` head variant, ``segmenter.py:292``)."""

    config_overrides = {
        "matcher_type": "atss",
        "cls_loss_type": "bce",
        "reg_loss_type": "giou",
        "segmenter_fg_bg": True,
        "seg_loss_type": "dice_topk",
    }


@MODULE_REGISTRY.register(name="RetinaUNetV010")
class RetinaUNetV010(BaseModule):
    """Classic IoU matching + BCE + smooth-L1 (RetinaNet-style baseline)."""

    config_overrides = {
        "matcher_type": "iou",
        "cls_loss_type": "bce",
        "reg_loss_type": "l1",
    }
