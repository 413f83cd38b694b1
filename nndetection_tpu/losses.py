"""Loss functions (pure jnp, mask-weighted instead of index-compacted).

Semantics mirror ``/root/reference/nndet/losses/``:

* ``bce_one_hot``: sigmoid BCE against a one-hot (background column dropped)
  with optional label smoothing; mean reduction over sampled anchors x classes
  (``classification.py:137-182``).
* ``focal_loss``: one-hot sigmoid focal loss (``classification.py:41-135``).
* ``giou_loss``: negative summed GIoU over positive pairs
  (``regression.py:118-162``).
* ``smooth_l1``: fvcore-style beta-parametrized (``regression.py:21-115``).
* ``soft_dice``: batch-dice soft dice with smooth nominator/denominator,
  background channel dropped (``segmentation.py:84-150``).

All functions take validity masks so they compose with static-shape sampling.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nndetection_tpu.core.boxes.ops import elementwise_generalized_box_iou


def one_hot_smooth(labels: jnp.ndarray, num_classes: int, smoothing: float = 0.0):
    """One-hot encoding with label smoothing (``classification.py:28-37``)."""
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if smoothing > 0:
        oh = oh * (1.0 - smoothing) + smoothing / num_classes
    return oh


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid BCE."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_one_hot(
    logits: jnp.ndarray,
    target_labels: jnp.ndarray,
    sample_mask: jnp.ndarray,
    num_classes: int,
    smoothing: float = 0.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Sigmoid BCE over foreground classes; background (label 0) encoded as
    all-zero rows. Mean over sampled anchors x classes.

    Args:
        logits: ``[N, C]`` foreground-class logits
        target_labels: ``[N]`` int labels (0 bg, 1..C fg)
        sample_mask: ``[N]`` selected anchors (pos + sampled neg)
    """
    oh = one_hot_smooth(target_labels, num_classes + 1, smoothing)[..., 1:]
    per = _bce_with_logits(logits.astype(jnp.float32), oh)
    w = sample_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w) * num_classes, 1.0)
    return loss_weight * jnp.sum(per * w[..., None]) / denom


def focal_loss(
    logits: jnp.ndarray,
    target_labels: jnp.ndarray,
    sample_mask: jnp.ndarray,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = -1.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """One-hot sigmoid focal loss, sum reduction over sampled anchors."""
    oh = one_hot_smooth(target_labels, num_classes + 1)[..., 1:]
    logits32 = logits.astype(jnp.float32)
    bce = _bce_with_logits(logits32, oh)
    p = jax.nn.sigmoid(logits32)
    pt = p * oh + (1 - p) * (1 - oh)
    loss = bce * (1 - pt) ** gamma
    if alpha >= 0:
        alpha_t = alpha * oh + (1 - alpha) * (1 - oh)
        loss = alpha_t * loss
    w = sample_mask.astype(jnp.float32)
    return loss_weight * jnp.sum(loss * w[..., None])


def giou_loss(
    pred_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    pos_mask: jnp.ndarray,
    eps: float = 1e-7,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Negative GIoU summed over positives, normalized by #positives
    (head-level ``/ max(1, num_pos)`` folded in)."""
    giou = elementwise_generalized_box_iou(pred_boxes, target_boxes, eps=eps)
    w = pos_mask.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(w), 1.0)
    return loss_weight * (-jnp.sum(giou * w)) / num_pos


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    pos_mask: jnp.ndarray,
    beta: float = 1.0 / 9,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Summed smooth-L1 over positives / #positives."""
    n = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    per = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    w = pos_mask.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(w), 1.0)
    return loss_weight * jnp.sum(per.sum(-1) * w) / num_pos


def softmax_ce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax cross entropy, channel-last logits ``[..., C]``, int targets.
    Mean reduction (optionally class-weighted like torch CrossEntropyLoss).

    Uses a one-hot contraction instead of ``take_along_axis`` — volumetric
    gathers on TPU fetch a whole memory tile per element and dominated the
    step profile; compare+select is pure VPU work."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(targets.astype(jnp.int32), logits.shape[-1], dtype=jnp.float32)
    nll = -jnp.sum(logp * oh, axis=-1)
    if weight is not None:
        w = jnp.sum(oh * weight[None], axis=-1)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.mean(nll)


def softmax_ce_masked(
    logits: jnp.ndarray,
    target_labels: jnp.ndarray,
    sample_mask: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Softmax CE over C+1 classes (background = column 0) restricted to the
    sampled anchors — the reference ``CEClassifier`` loss
    (``/root/reference/nndet/arch/heads/classifier.py:295-366`` with torch
    ``CrossEntropyLoss(weight=...)``, reduction ``mean``): weighted mean
    ``sum(w[y_i] * nll_i) / sum(w[y_i])`` over the sampled set.

    Args:
        logits: ``[N, C+1]`` logits including the background column
        target_labels: ``[N]`` int labels (0 bg, 1..C fg)
        sample_mask: ``[N]`` selected anchors (pos + sampled neg)
        class_weights: optional ``[C+1]`` frequency-balancing weights
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(target_labels, logits.shape[-1], dtype=jnp.float32)
    nll = -jnp.sum(logp * oh, axis=-1)
    w = sample_mask.astype(jnp.float32)
    if class_weights is not None:
        w = w * jnp.sum(oh * jnp.asarray(class_weights, jnp.float32)[None], axis=-1)
    return loss_weight * jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def topk_ce_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, topk_fraction: float
) -> jnp.ndarray:
    """Top-k CE (``segmentation.py:154-196``): mean over the hardest k% voxels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ].reshape(-1)
    k = max(1, int(nll.shape[0] * topk_fraction / 100.0))
    vals, _ = jax.lax.top_k(nll, k)
    return jnp.mean(vals)


def maxpool_downsample_target(target: jnp.ndarray, factor) -> jnp.ndarray:
    """Project a segmentation target to a coarser level by max pooling
    (reference ``MaxPoolToShapes``, ``nndet/arch/layers/interpolation.py:77``)."""
    dims = target.ndim - 1  # [N, *spatial]
    if isinstance(factor, int):
        factor = (factor,) * dims
    window = (1,) + tuple(factor)
    return jax.lax.reduce_window(
        target, -(2**30), jax.lax.max, window, window, "VALID"
    )


def deep_supervision_seg_loss(
    logits_list,
    target: jnp.ndarray,
    strides,
    alpha: float = 0.5,
    batch_dice: bool = True,
) -> jnp.ndarray:
    """Weighted multi-level CE+dice: level weights halve per level and are
    normalized (nnU-Net deep-supervision convention)."""
    weights = jnp.asarray([0.5**i for i in range(len(logits_list))])
    weights = weights / jnp.sum(weights)
    total = 0.0
    for i, logits in enumerate(logits_list):
        tgt = target if i == 0 else maxpool_downsample_target(target, strides[i])
        ce = softmax_ce_loss(logits, tgt)
        dice = soft_dice_loss(logits, tgt, batch_dice=batch_dice, do_bg=False)
        total = total + weights[i] * (alpha * ce + (1 - alpha) * dice)
    return total


def soft_dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    batch_dice: bool = True,
    do_bg: bool = False,
    smooth_nom: float = 1e-5,
    smooth_denom: float = 1e-5,
) -> jnp.ndarray:
    """Soft dice on softmax probabilities; channel-last ``[N, *spatial, C]``.

    Returns ``1 - mean(dice)`` like the reference.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(targets.astype(jnp.int32), num_classes, dtype=jnp.float32)
    # reduce over spatial axes (+ batch for batch_dice)
    axes = tuple(range(1, logits.ndim - 1))
    if batch_dice:
        axes = (0,) + axes
    tp = jnp.sum(probs * oh, axis=axes)
    fp = jnp.sum(probs * (1 - oh), axis=axes)
    fn = jnp.sum((1 - probs) * oh, axis=axes)
    dc = (2 * tp + smooth_nom) / (2 * tp + fp + fn + smooth_denom)
    if not do_bg:
        dc = dc[..., 1:]
    return 1.0 - jnp.mean(dc)
