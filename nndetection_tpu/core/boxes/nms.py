"""Non-maximum suppression under XLA: fixed shapes, exact greedy semantics.

The reference ships a CUDA bitmask kernel plus host greedy scan
(``/root/reference/nndet/csrc/cuda/nms.cu:22-219``) and returns ragged index
lists. The TPU-native formulation exploits that every caller bounds the number
of survivors (``detections_per_img``, per-tile caps): greedy NMS truncated to
``max_out`` survivors is computed as ``max_out`` iterations of
(argmax -> suppress-by-IoU), each O(N) vector work, without materializing an
N x N IoU matrix. This is mathematically identical to full greedy NMS followed
by ``keep[:max_out]``.

``nms_mask`` provides the untruncated O(N^2) masked variant for small N
(tests, golden comparisons).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from nndetection_tpu.core.boxes.ops import box_corners, box_iou, boxes_from_corners

# NMS backend: "lax" (argmax-suppress scan), "pallas" (single-invocation
# VMEM-resident greedy kernel, ``ops/pallas_ops.py::nms_topk_pallas``), or
# "auto" (pallas on TPU, lax elsewhere — the measured decision: the VMEM
# kernel wins 1.25-1.66x on chip with bitwise-identical outputs,
# ``artifacts/pallas_bench.json``; Mosaic lowering exists only for TPU).
_NMS_IMPL = os.environ.get("NNDET_NMS_IMPL", "auto")


def _resolve_impl() -> str:
    global _NMS_IMPL
    if _NMS_IMPL == "auto":
        try:
            platform = jax.default_backend()
        except Exception:  # noqa: BLE001 — backend probe must never fail NMS
            platform = "cpu"
        _NMS_IMPL = "pallas" if platform == "tpu" else "lax"
    return _NMS_IMPL


def set_nms_impl(name: str) -> None:
    global _NMS_IMPL
    assert name in ("lax", "pallas", "auto"), name
    _NMS_IMPL = name


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of a single box [2*dim] against [N, 2*dim] -> [N] (float32)."""
    return box_iou(box[None].astype(jnp.float32), boxes.astype(jnp.float32))[0]


def topk_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS keeping at most ``max_out`` boxes.

    Args:
        boxes: ``[N, 2*dim]``
        scores: ``[N]``
        valid: boolean validity ``[N]`` (padding / score-thresholded entries)
        iou_threshold: suppression threshold (strictly-greater suppresses)
        max_out: static number of survivors to emit

    Returns:
        ``(keep_idx [max_out] int32, keep_valid [max_out] bool)`` ordered by
        descending score.
    """
    n = boxes.shape[0]
    if _resolve_impl() == "pallas" and boxes.shape[-1] == 6:
        from nndetection_tpu.ops.pallas_ops import nms_topk_pallas

        idx, keep_valid = nms_topk_pallas(
            boxes, scores, valid, iou_threshold, min(max_out, n)
        )
        if max_out > n:
            pad = max_out - n
            idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
            keep_valid = jnp.concatenate([keep_valid, jnp.zeros((pad,), bool)])
        return idx, keep_valid
    boxes32 = boxes.astype(jnp.float32)
    masked = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)

    def step(scores_m, _):
        i = jnp.argmax(scores_m)
        alive = jnp.isfinite(scores_m[i])
        iou = _iou_one_vs_all(boxes32[i], boxes32)
        suppress = iou > iou_threshold
        scores_m = jnp.where(suppress & alive, -jnp.inf, scores_m)
        scores_m = scores_m.at[i].set(-jnp.inf)
        return scores_m, (i.astype(jnp.int32), alive)

    _, (idx, keep_valid) = jax.lax.scan(step, masked, None, length=min(max_out, n))
    if max_out > n:
        pad = max_out - n
        idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
        keep_valid = jnp.concatenate([keep_valid, jnp.zeros((pad,), bool)])
    return idx, keep_valid


def batched_nms_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-batched greedy NMS via the coordinate-offset trick
    (``/root/reference/nndet/core/boxes/nms.py:81-106``): boxes of different
    labels are translated to disjoint regions so they can never suppress each
    other, then a single :func:`topk_nms` runs over everything."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    offsets = labels.astype(jnp.float32) * (max_coord + 1.0)
    mins, maxs = box_corners(boxes.astype(jnp.float32))
    shifted = boxes_from_corners(mins + offsets[..., None], maxs + offsets[..., None])
    return topk_nms(shifted, scores, valid, iou_threshold, max_out)


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Untruncated greedy NMS returning a keep mask ``[N]``.

    O(N^2) memory — intended for modest N (exact-semantics checks, WBC-scale
    candidate sets)."""
    n = boxes.shape[0]
    masked = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-masked)
    iou = box_iou(boxes[order], boxes[order])
    valid_sorted = jnp.isfinite(masked[order])

    def body(i, keep):
        row_alive = keep[i] & valid_sorted[i]
        suppress = row_alive & (iou[i] > iou_threshold) & (jnp.arange(n) > i)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_sorted)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-batched :func:`nms_mask` via the coordinate-offset trick."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    offsets = labels.astype(jnp.float32) * (max_coord + 1.0)
    mins, maxs = box_corners(boxes.astype(jnp.float32))
    shifted = boxes_from_corners(mins + offsets[..., None], maxs + offsets[..., None])
    return nms_mask(shifted, scores, valid, iou_threshold)


def weighted_nms_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS ranking by ``scores * weights`` but reporting raw scores — the
    model-level "weighted NMS" used during ensembling
    (``/root/reference/nndet/inference/detection/model.py:57``)."""
    return topk_nms(boxes, scores * weights, valid, iou_threshold, max_out)
