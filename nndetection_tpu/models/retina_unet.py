"""Retina U-Net: the flagship detector (encoder + U-FPN + RetinaNet heads +
auxiliary segmentation head).

TPU-native redesign of ``/root/reference/nndet/core/retina.py:25-414`` and the
``RetinaUNetV001`` wiring (``/root/reference/nndet/ptmodule/retinaunet/v001.py:29-38``):

* the whole train step is one pure jitted function over static shapes: padded
  GT + masks instead of ragged per-image lists, anchors folded in as
  constants, matching/sampling/losses fully batched via ``vmap``;
* postprocessing uses the truncated-greedy NMS scan
  (:mod:`nndetection_tpu.core.boxes.nms`) and returns fixed-size, masked
  detection arrays.

Default hyperparameters follow ``/root/reference/nndet/conf/train/v001.yaml``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nndetection_tpu import losses as L
from nndetection_tpu.core.boxes.anchors import AnchorGenerator
from nndetection_tpu.core.boxes.coder import BoxCoder
from nndetection_tpu.core.boxes.matcher import ATSSMatcher, gather_matched
from nndetection_tpu.core.boxes.nms import batched_nms_topk
from nndetection_tpu.core.boxes.ops import clip_boxes_to_image, small_boxes_mask
from nndetection_tpu.core.boxes.sampler import HardNegativeSamplerBatched
from nndetection_tpu.models.decoder import UFPN
from nndetection_tpu.models.encoder import Encoder, encoder_strides
from nndetection_tpu.models.heads import Classifier, Regressor, Segmenter


@dataclass(frozen=True)
class RetinaUNetConfig:
    """Static architecture + training-step configuration (the "plan_arch")."""

    dim: int = 3
    in_channels: int = 1
    classifier_classes: int = 1  # foreground classes
    seg_classes: int = 1
    start_channels: int = 32
    max_channels: int = 320
    fpn_channels: int = 128
    head_channels: int = 128
    conv_kernels: Tuple = ((3, 3, 3),) * 5
    strides: Tuple = ((2, 2, 2),) * 4  # between stages
    decoder_levels: Tuple[int, ...] = (1, 2, 3, 4)
    patch_size: Tuple[int, ...] = (96, 96, 96)
    # anchors: per-decoder-level size tuples along each axis
    anchor_width: Tuple = ((8, 16, 24),) * 4
    anchor_height: Tuple = ((8, 16, 24),) * 4
    anchor_depth: Tuple = ((8, 16, 24),) * 4
    # head
    head_num_convs: int = 1
    learn_scale: bool = True
    prior_prob: float = 0.01
    # matcher / sampler (v001 defaults)
    matcher_type: str = "atss"  # "atss" | "iou"
    matcher_num_candidates: int = 4
    matcher_center_in_gt: bool = False
    matcher_low_threshold: float = 0.3
    matcher_high_threshold: float = 0.5
    # loss family ("bce"|"focal"|"ce" classification, "giou"|"l1" regression);
    # "ce" = softmax over C+1 classes with optional frequency-balanced
    # class_weights (reference CEClassifier, ``classifier.py:295-366`` — the
    # RetinaUNetModule base default, ``ptmodule/retinaunet/base.py:82``)
    cls_loss_type: str = "bce"
    reg_loss_type: str = "giou"
    class_weights: Optional[Tuple[float, ...]] = None  # [C+1], bg first
    # detection-head loss variant (reference ``comb.py:160-530``):
    #   "hnm"        reg on *sampled* positives (DetectionHeadHNM/HNMNative)
    #   "hnm_reg_all" reg on ALL positives (DetectionHeadHNM[Native]RegAll)
    #   "no_sampler" no HNM: cls on all non-ignore anchors / num_pos,
    #                reg on all positives (BoxHeadNoSampler)
    head_type: str = "hnm"
    focal_gamma: float = 2.0
    focal_alpha: float = -1.0
    batch_size_per_image: int = 32
    positive_fraction: float = 0.33
    pool_size: float = 20.0
    min_neg: int = 1
    # segmenter
    segmenter_alpha: float = 0.5
    segmenter_fg_bg: bool = True
    batch_dice: bool = True
    segmenter_deep_supervision: bool = False
    seg_supervision_levels: int = 3
    # "dice_ce" (default) | "dice_topk" (hardest-k% CE, reference
    # DiceTopKSegmenter, segmenter.py:292)
    seg_loss_type: str = "dice_ce"
    seg_topk_fraction: float = 10.0
    # postprocessing
    topk_candidates: int = 10000
    score_thresh: float = 0.0
    detections_per_img: int = 100
    remove_small_boxes: float = 0.01
    nms_thresh: float = 0.6
    dtype: str = "bfloat16"
    # rematerialize encoder/decoder/head activations in backward (trade ~1
    # extra forward for the dominant activation HBM; jax.checkpoint)
    remat: bool = True
    # force exact top-k in ATSS candidate selection and the HNM pool instead
    # of the TPU-optimized approx_{min,max}_k (recall ~0.95) — the ablation
    # switch for quantifying the approximation's AP effect (VERDICT r1 #8)
    exact_topk: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def num_levels(self) -> int:
        return len(self.conv_kernels)

    @property
    def classifier_out_classes(self) -> int:
        """Logit channels of the classifier head: softmax-CE adds an explicit
        background column (reference ``classifier.py:338``)."""
        return self.classifier_classes + (1 if self.cls_loss_type == "ce" else 0)

    def anchors_per_loc(self) -> int:
        if self.dim == 2:
            return len(self.anchor_width[0]) * len(self.anchor_height[0])
        return (
            len(self.anchor_width[0])
            * len(self.anchor_height[0])
            * len(self.anchor_depth[0])
        )

    def decoder_strides(self) -> List[List[int]]:
        """Cumulative stride of each decoder level used by the heads."""
        all_strides = encoder_strides(self.num_levels, self.strides, self.dim)
        return [all_strides[l] for l in self.decoder_levels]

    def feature_shapes(self, patch_size: Optional[Sequence[int]] = None) -> List[Tuple[int, ...]]:
        ps = tuple(patch_size or self.patch_size)
        shapes = []
        for stride in self.decoder_strides():
            shapes.append(tuple(-(-p // s) for p, s in zip(ps, stride)))
        return shapes

    def anchors(self, patch_size: Optional[Sequence[int]] = None) -> Tuple[np.ndarray, List[int]]:
        """Precompute the full anchor grid for a patch size (trace-time const)."""
        gen = AnchorGenerator(
            width=self.anchor_width,
            height=self.anchor_height,
            depth=self.anchor_depth if self.dim == 3 else None,
        )
        return gen.grid_anchors(self.feature_shapes(patch_size), self.decoder_strides())


class RetinaUNet(nn.Module):
    """Forward network: images (channel-last) -> detection + segmentation
    predictions. Target assignment and losses live in :func:`train_step_loss`
    (pure functions) — the module holds only parameters."""

    cfg: RetinaUNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        x = images.astype(dtype)
        EncoderCls = nn.remat(Encoder) if cfg.remat else Encoder
        UFPNCls = nn.remat(UFPN) if cfg.remat else UFPN
        ClassifierCls = nn.remat(Classifier) if cfg.remat else Classifier
        RegressorCls = nn.remat(Regressor) if cfg.remat else Regressor
        fmaps = EncoderCls(
            conv_kernels=cfg.conv_kernels,
            strides=cfg.strides,
            start_channels=cfg.start_channels,
            max_channels=cfg.max_channels,
            dim=cfg.dim,
            dtype=dtype,
            name="encoder",
        )(x)
        all_strides = encoder_strides(cfg.num_levels, cfg.strides, cfg.dim)
        decoded = UFPNCls(
            strides=tuple(tuple(s) for s in all_strides),
            conv_kernels=cfg.conv_kernels,
            decoder_levels=cfg.decoder_levels,
            fixed_out_channels=cfg.fpn_channels,
            dim=cfg.dim,
            dtype=dtype,
            name="decoder",
        )(fmaps)
        head_maps = [decoded[l] for l in cfg.decoder_levels]

        box_logits = ClassifierCls(
            num_classes=cfg.classifier_out_classes,
            anchors_per_pos=cfg.anchors_per_loc(),
            internal_channels=cfg.head_channels,
            num_convs=cfg.head_num_convs,
            prior_prob=cfg.prior_prob,
            dim=cfg.dim,
            dtype=dtype,
            name="classifier",
        )(head_maps)
        box_deltas = RegressorCls(
            anchors_per_pos=cfg.anchors_per_loc(),
            internal_channels=cfg.head_channels,
            num_convs=cfg.head_num_convs,
            learn_scale=cfg.learn_scale,
            dim=cfg.dim,
            dtype=dtype,
            name="regressor",
        )(head_maps)
        seg_cls = 1 if cfg.segmenter_fg_bg else cfg.seg_classes
        # head outputs stay in the compute dtype (bf16): every consumer
        # (losses.py, postprocess_detections, the coder) upcasts to f32 at
        # point of use, where XLA fuses the convert into the consuming
        # reduction — materializing f32 copies of the [B,A,*] tensors here
        # doubled their HBM write+read traffic for no precision gain
        out = {
            "box_logits": box_logits,
            "box_deltas": box_deltas,
        }
        from nndetection_tpu.parallel.spatial import (
            gather_spatial,
            get_spatial_axis,
        )

        spatial_ax = get_spatial_axis()

        def _gather_seg(s):
            # under spatial partitioning the seg loss runs on the full map:
            # all-gather the z-shards back (axis 1 = leading spatial axis)
            if spatial_ax is None:
                return s
            return gather_spatial(s, axis_name=spatial_ax, spatial_axis=1)

        if cfg.segmenter_deep_supervision:
            from nndetection_tpu.models.heads import DeepSupervisionSegmenter

            seg_list = DeepSupervisionSegmenter(
                seg_classes=seg_cls,
                num_levels=cfg.seg_supervision_levels,
                dim=cfg.dim,
                dtype=dtype,
                name="segmenter",
            )(decoded)
            out["seg_logits"] = _gather_seg(seg_list[0])
            for i, s in enumerate(seg_list[1:], start=1):
                out[f"seg_logits_aux{i}"] = _gather_seg(s)
        else:
            out["seg_logits"] = _gather_seg(
                Segmenter(
                    seg_classes=seg_cls,
                    dim=cfg.dim,
                    dtype=dtype,
                    name="segmenter",
                )(decoded)
            )
        return out


def assign_targets(
    cfg: RetinaUNetConfig,
    anchors: jnp.ndarray,
    anchors_per_level: Sequence[int],
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ATSS assignment -> per-anchor ``(labels, matched_boxes)``.

    labels: ``[B, A]`` (0 bg, -1 ignore, 1..C fg); boxes ``[B, A, 2*dim]``.
    """
    if cfg.matcher_type == "atss":
        matcher = ATSSMatcher(
            num_candidates=cfg.matcher_num_candidates,
            center_in_gt=cfg.matcher_center_in_gt,
            approx_topk=not cfg.exact_topk,
        )
    else:
        from nndetection_tpu.core.boxes.matcher import IoUMatcher

        matcher = IoUMatcher(
            low_threshold=cfg.matcher_low_threshold,
            high_threshold=cfg.matcher_high_threshold,
        )

    def one(gtb, gtc, gtm):
        match = matcher(gtb, gtm, anchors, tuple(anchors_per_level), cfg.anchors_per_loc())
        return gather_matched(match, gtb, gtc)

    return jax.vmap(one)(gt_boxes, gt_classes, gt_mask)


def train_step_loss(
    cfg: RetinaUNetConfig,
    predictions: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,
    anchors_per_level: Sequence[int],
    targets: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Loss assembly of ``DetectionHeadHNMNative`` + ``DiCESegmenterFgBg``
    (``/root/reference/nndet/arch/heads/comb.py:351-406``,
    ``segmenter.py:184-290``).

    Args:
        predictions: model outputs (``box_logits [B,A,C]``, ``box_deltas
            [B,A,2d]``, ``seg_logits [B,*sp,C+1]``)
        targets: ``gt_boxes [B,G,2d]``, ``gt_classes [B,G]``, ``gt_mask [B,G]``,
            ``seg [B,*spatial]`` int

    Returns:
        dict of scalar losses (``cls``, ``reg``, ``seg_ce``, ``seg_dice``).
    """
    box_logits = predictions["box_logits"]
    box_deltas = predictions["box_deltas"]
    b, a, c = box_logits.shape

    labels, matched_boxes = assign_targets(
        cfg, anchors, anchors_per_level,
        targets["gt_boxes"], targets["gt_classes"], targets["gt_mask"],
    )

    flat_labels = labels.reshape(-1)
    flat_logits = box_logits.reshape(-1, c)
    # foreground probabilities driving hard-negative selection (reference
    # ``box_logits_to_probs``: sigmoid, or softmax minus the background
    # column for the CE classifier — ``comb.py:265-268``, ``classifier.py:357``)
    if cfg.cls_loss_type == "ce":
        fg_probs = jnp.max(
            jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1)[..., 1:],
            axis=-1,
        )
    else:
        # f32 sigmoid for the HNM ranking: bf16 probabilities quantize to
        # ~256 levels and tie-break the negative pool arbitrarily; the
        # convert fuses into this reduction (no extra f32 copy of logits)
        fg_probs = jnp.max(
            jax.nn.sigmoid(box_logits.astype(jnp.float32)), axis=-1
        )  # [B, A]

    if cfg.head_type == "no_sampler":
        # BoxHeadNoSampler (``comb.py:279-348``): every non-ignore anchor
        # enters the classification loss, every positive the regression loss.
        pos_mask = flat_labels >= 1
        neg_mask = flat_labels == 0
        sample_mask = flat_labels >= 0
    else:
        # Hard-negative sampling runs PER IMAGE (the reference's
        # ``HardNegativeSampler`` variant, ``sampler.py:101-209``) rather than
        # the batch-global variant: under data-parallel sharding a
        # batch-global top-k would all-gather every anchor score across the
        # mesh; per-image sampling is shard-local and keeps the step
        # collective-free up to the gradient all-reduce.
        sampler = HardNegativeSamplerBatched(
            batch_size_per_image=cfg.batch_size_per_image,
            positive_fraction=cfg.positive_fraction,
            min_neg=cfg.min_neg,
            pool_size=cfg.pool_size,
            batch_size=1,
            approx_topk=not cfg.exact_topk,
        )
        keys = jax.random.split(key, b)
        pos_mask, neg_mask = jax.vmap(sampler)(
            keys, labels, jax.lax.stop_gradient(fg_probs)
        )
        pos_mask = pos_mask.reshape(-1)
        neg_mask = neg_mask.reshape(-1)
        sample_mask = pos_mask | neg_mask
    # "RegAll" variants regress ALL positives, not just the sampled subset
    # (``comb.py:408-530``); the no-sampler head does the same.
    reg_mask = pos_mask if cfg.head_type == "hnm" else (flat_labels >= 1)
    num_pos = jnp.maximum(jnp.sum(pos_mask.astype(jnp.float32)), 1.0)

    num_fg = cfg.classifier_classes
    if cfg.cls_loss_type == "focal":
        cls_loss = L.focal_loss(
            flat_logits,
            jnp.clip(flat_labels, min=0),
            sample_mask,
            num_classes=num_fg,
            gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha,
        ) / num_pos
    elif cfg.cls_loss_type == "ce":
        cw = (
            jnp.asarray(cfg.class_weights, jnp.float32)
            if cfg.class_weights is not None
            else None
        )
        cls_loss = L.softmax_ce_masked(
            flat_logits, jnp.clip(flat_labels, min=0), sample_mask, class_weights=cw
        )
    else:
        cls_loss = L.bce_one_hot(
            flat_logits,
            jnp.clip(flat_labels, min=0),
            sample_mask,
            num_classes=num_fg,
        )
    if cfg.head_type == "no_sampler":
        cls_loss = cls_loss / num_pos

    coder = BoxCoder(dim=cfg.dim)
    flat_anchors = jnp.broadcast_to(anchors[None], (b, a, anchors.shape[-1])).reshape(
        -1, anchors.shape[-1]
    )
    if cfg.reg_loss_type == "l1":
        target_deltas = coder.encode(
            matched_boxes.reshape(-1, anchors.shape[-1]), flat_anchors
        )
        reg_loss = L.smooth_l1_loss(
            box_deltas.reshape(-1, anchors.shape[-1]), target_deltas, reg_mask
        )
    else:
        pred_boxes = coder.decode(
            box_deltas.reshape(-1, anchors.shape[-1]), flat_anchors
        )
        reg_loss = L.giou_loss(
            pred_boxes, matched_boxes.reshape(-1, anchors.shape[-1]), reg_mask
        )

    seg_target = targets["seg"]
    if cfg.segmenter_fg_bg:
        seg_target = (seg_target > 0).astype(jnp.int32)
    seg_logits = predictions["seg_logits"]
    if cfg.segmenter_deep_supervision:
        aux = [
            predictions[f"seg_logits_aux{i}"]
            for i in range(1, cfg.seg_supervision_levels)
            if f"seg_logits_aux{i}" in predictions
        ]
        logits_list = [seg_logits] + aux
        strides = [
            tuple(
                seg_target.shape[1 + d] // l.shape[1 + d]
                for d in range(seg_target.ndim - 1)
            )
            for l in logits_list
        ]
        ds = L.deep_supervision_seg_loss(
            logits_list, seg_target, strides,
            alpha=cfg.segmenter_alpha, batch_dice=cfg.batch_dice,
        )
        seg_ce = ds
        seg_dice = jnp.zeros(())
    else:
        if cfg.seg_loss_type == "dice_topk":
            ce = L.topk_ce_loss(seg_logits, seg_target, cfg.seg_topk_fraction)
        else:
            ce = L.softmax_ce_loss(seg_logits, seg_target)
        seg_ce = cfg.segmenter_alpha * ce
        seg_dice = (1 - cfg.segmenter_alpha) * L.soft_dice_loss(
            seg_logits, seg_target, batch_dice=cfg.batch_dice, do_bg=False
        )
    return {
        "cls": cls_loss,
        "reg": reg_loss,
        "seg_ce": seg_ce,
        "seg_dice": seg_dice,
        "num_pos": jnp.sum(pos_mask.astype(jnp.float32)),
        "num_neg": jnp.sum(neg_mask.astype(jnp.float32)),
    }


def postprocess_detections(
    cfg: RetinaUNetConfig,
    box_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    image_shape: Sequence[int],
    topk_candidates: Optional[int] = None,
    max_out: Optional[int] = None,
    score_thresh: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Single-image detection postprocessing
    (``/root/reference/nndet/core/retina.py:292-379``): decode -> clip ->
    flatten over classes -> top-k -> score threshold -> small-box removal ->
    class-batched NMS -> cap at ``detections_per_img``.

    Args:
        box_logits: ``[A, C]``; box_deltas ``[A, 2*dim]``; anchors ``[A, 2*dim]``

    Returns fixed-size ``boxes [M, 2*dim] / scores [M] / labels [M] /
    valid [M]`` with ``M = max_out``.
    """
    a = box_logits.shape[0]
    # softmax-CE heads carry an explicit background column dropped here
    # (reference ``box_logits_to_probs``, ``classifier.py:357-366``)
    if cfg.cls_loss_type == "ce":
        probs_fg = jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1)[..., 1:]
    else:
        probs_fg = jax.nn.sigmoid(box_logits.astype(jnp.float32))
    c = probs_fg.shape[-1]
    topk = min(topk_candidates or cfg.topk_candidates, a * c)
    max_out = max_out or cfg.detections_per_img
    score_thresh = cfg.score_thresh if score_thresh is None else score_thresh

    coder = BoxCoder(dim=cfg.dim)
    boxes = coder.decode(box_deltas, anchors)
    boxes = clip_boxes_to_image(boxes, image_shape)

    probs = probs_fg.reshape(-1)  # [A*C]
    top_probs, top_idx = jax.lax.top_k(probs, topk)
    anchor_idx = top_idx // c
    top_labels = (top_idx % c).astype(jnp.int32)
    top_boxes = boxes[anchor_idx]

    valid = top_probs > score_thresh
    if cfg.remove_small_boxes is not None:
        valid = valid & small_boxes_mask(top_boxes, cfg.remove_small_boxes)

    keep_idx, keep_valid = batched_nms_topk(
        top_boxes, top_probs, top_labels, valid, cfg.nms_thresh, max_out
    )
    return {
        "boxes": top_boxes[keep_idx],
        "scores": top_probs[keep_idx],
        "labels": top_labels[keep_idx],
        "valid": keep_valid,
    }


def batched_postprocess(
    cfg: RetinaUNetConfig,
    predictions: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,
    image_shape: Sequence[int],
    with_seg: bool = True,
    **kwargs,
) -> Dict[str, jnp.ndarray]:
    """vmapped :func:`postprocess_detections` over the batch."""
    fn = lambda lg, dl: postprocess_detections(
        cfg, lg, dl, anchors, image_shape, **kwargs
    )
    out = jax.vmap(fn)(predictions["box_logits"], predictions["box_deltas"])
    if with_seg and "seg_logits" in predictions:
        out["seg_probs"] = jax.nn.softmax(
            predictions["seg_logits"].astype(jnp.float32), axis=-1
        )
    return out
