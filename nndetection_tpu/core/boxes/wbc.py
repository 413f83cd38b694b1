"""Weighted box clustering (Jaeger et al. style) with static shapes.

Reimplements ``/root/reference/nndet/inference/detection/wbc.py:30-198``: greedy
clustering from the highest-scoring box, consolidating each cluster into a
single (score-weighted average) box with a score dampened by the number of
*missing* expected predictions. The data-dependent while-loop over surviving
boxes becomes a ``lax.while_loop`` over fixed-size masks; outputs are padded to
the input size with a validity mask.

Host-side NumPy twins live in :mod:`nndetection_tpu.evaluator` callers via
``wbc_np`` below for CPU ensembling paths.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nndetection_tpu.core.boxes.ops import box_area, box_iou
from nndetection_tpu.core.boxes.ops_np import box_area_np, box_iou_np


def wbc(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    weights: jnp.ndarray,
    n_exp_preds: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    score_thresh: float = 0.0,
    use_area: bool = False,
    missing_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-class weighted box clustering.

    Args:
        boxes: ``[N, 2*dim]``
        scores: ``[N]``
        weights: per-box weights (tile-border down-weighting etc.) ``[N]``
        n_exp_preds: expected number of predictions per box ``[N]``
        valid: validity mask ``[N]``
        iou_thresh: boxes with IoU > thresh w.r.t. the cluster seed join it
        score_thresh: clusters with consolidated score <= thresh are dropped
        use_area: multiply weights by box area
        missing_weight: dampening weight for missing predictions

    Returns:
        ``(out_boxes [N, 2*dim], out_scores [N], out_valid [N])`` — clusters in
        the order they were formed (descending seed score), padded.
    """
    n = boxes.shape[0]
    boxes32 = boxes.astype(jnp.float32)
    scores32 = scores.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    if use_area:
        w = w * box_area(boxes32)
    ious = box_iou(boxes32, boxes32)  # [N, N]

    def cond(state):
        remaining, *_ = state
        return jnp.any(remaining)

    def body(state):
        remaining, out_boxes, out_scores, out_valid, count = state
        seed = jnp.argmax(jnp.where(remaining, scores32, -jnp.inf))
        cluster = remaining & (ious[seed] > iou_thresh)
        cm = cluster.astype(jnp.float32)
        n_found = jnp.sum(cm)

        seed_iou = ious[seed]
        msw = seed_iou * w * cm  # match score weights, masked
        ms = msw * scores32  # match scores
        n_expected = jnp.sum(n_exp_preds.astype(jnp.float32) * cm) / jnp.maximum(
            n_found, 1.0
        )
        n_missing = jnp.maximum(0.0, n_expected - n_found)
        msw_sum = jnp.sum(msw)
        msw_mean = msw_sum / jnp.maximum(n_found, 1.0)
        denom = msw_sum + n_missing * msw_mean * missing_weight
        new_score = jnp.sum(ms) / jnp.maximum(denom, 1e-12)
        new_box = jnp.sum(boxes32 * ms[:, None], axis=0) / jnp.maximum(
            jnp.sum(ms), 1e-12
        )

        emit = new_score > score_thresh
        out_boxes = out_boxes.at[count].set(jnp.where(emit, new_box, out_boxes[count]))
        out_scores = out_scores.at[count].set(
            jnp.where(emit, new_score, out_scores[count])
        )
        out_valid = out_valid.at[count].set(emit | out_valid[count])
        count = count + emit.astype(jnp.int32)
        remaining = remaining & ~cluster
        return remaining, out_boxes, out_scores, out_valid, count

    init = (
        valid & jnp.isfinite(scores32),
        jnp.zeros_like(boxes32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool),
        jnp.int32(0),
    )
    _, out_boxes, out_scores, out_valid, _ = jax.lax.while_loop(cond, body, init)
    return out_boxes, out_scores, out_valid


def batched_wbc(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    n_exp_preds: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    score_thresh: float = 0.0,
    use_area: bool = False,
    missing_weight: float = 1.0,
    num_classes: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class WBC (``wbc.py:30-91``): each class is clustered independently.

    Uses the class-offset trick on IoU by running :func:`wbc` per class with
    masked validity — classes are static so the loop unrolls at trace time.

    Returns ``(boxes [N, 2*dim], scores [N], labels [N], valid [N])``.
    """
    outs_b, outs_s, outs_l, outs_v = [], [], [], []
    for c in range(num_classes):
        v = valid & (labels == c)
        b, s, ov = wbc(
            boxes,
            scores,
            weights,
            n_exp_preds,
            v,
            iou_thresh=iou_thresh,
            score_thresh=score_thresh,
            use_area=use_area,
            missing_weight=missing_weight,
        )
        outs_b.append(b)
        outs_s.append(s)
        outs_l.append(jnp.full(s.shape, c, dtype=jnp.int32))
        outs_v.append(ov)
    return (
        jnp.concatenate(outs_b, axis=0),
        jnp.concatenate(outs_s, axis=0),
        jnp.concatenate(outs_l, axis=0),
        jnp.concatenate(outs_v, axis=0),
    )


# ---------------------------------------------------------------------------
# NumPy twin (host-side ensembling / tests)
# ---------------------------------------------------------------------------
def wbc_np(
    boxes: np.ndarray,
    scores: np.ndarray,
    weights: np.ndarray,
    n_exp_preds: np.ndarray,
    iou_thresh: float,
    score_thresh: float = 0.0,
    use_area: bool = False,
    missing_weight: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-faithful host implementation (golden for :func:`wbc`).
    Dispatches to the native C++ kernel (csrc/nndet_host.cpp) when built."""
    if len(boxes) == 0:
        return np.zeros((0, boxes.shape[-1] if boxes.ndim == 2 else 6)), np.zeros((0,))
    if boxes.shape[-1] == 6:
        from nndetection_tpu.ops.native import wbc_native

        out = wbc_native(
            boxes, scores, weights, n_exp_preds,
            iou_thresh=iou_thresh, score_thresh=score_thresh,
            use_area=use_area, missing_weight=missing_weight,
        )
        if out is not None:
            return out
    boxes = boxes.astype(np.float64)
    scores = scores.astype(np.float64)
    w = weights.astype(np.float64)
    if use_area:
        w = w * box_area_np(boxes)
    ious = box_iou_np(boxes, boxes)
    idx_pool = np.argsort(-scores, kind="stable")
    out_boxes, out_scores = [], []
    while idx_pool.size > 0:
        seed = idx_pool[0]
        m = ious[seed][idx_pool] > iou_thresh
        cluster = idx_pool[m]
        n_found = len(cluster)
        n_expected = float(np.mean(n_exp_preds[cluster]))
        msw = ious[seed][cluster] * w[cluster]
        ms = msw * scores[cluster]
        n_missing = max(0.0, n_expected - n_found)
        denom = msw.sum() + n_missing * msw.mean() * missing_weight
        new_score = ms.sum() / denom
        new_box = (boxes[cluster] * ms[:, None]).sum(0) / ms.sum()
        if new_score > score_thresh:
            out_boxes.append(new_box)
            out_scores.append(new_score)
        idx_pool = idx_pool[~m]
    if out_boxes:
        return np.stack(out_boxes, 0), np.asarray(out_scores)
    return np.zeros((0, boxes.shape[-1])), np.zeros((0,))


def batched_wbc_np(
    boxes: np.ndarray,
    scores: np.ndarray,
    labels: np.ndarray,
    weights: np.ndarray,
    n_exp_preds: np.ndarray,
    iou_thresh: float,
    score_thresh: float = 0.0,
    use_area: bool = False,
    missing_weight: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    outs_b, outs_s, outs_l = [], [], []
    for c in np.unique(labels):
        m = labels == c
        b, s = wbc_np(
            boxes[m],
            scores[m],
            weights[m],
            n_exp_preds[m],
            iou_thresh=iou_thresh,
            score_thresh=score_thresh,
            use_area=use_area,
            missing_weight=missing_weight,
        )
        outs_b.append(b)
        outs_s.append(s)
        outs_l.append(np.full(len(s), c))
    if outs_b:
        return (
            np.concatenate(outs_b, 0),
            np.concatenate(outs_s, 0),
            np.concatenate(outs_l, 0),
        )
    d = boxes.shape[-1] if boxes.ndim == 2 else 6
    return np.zeros((0, d)), np.zeros((0,)), np.zeros((0,))
