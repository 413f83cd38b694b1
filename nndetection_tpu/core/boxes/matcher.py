"""Anchor-to-GT matching with static shapes.

Reimplements the semantics of the reference matchers
(``/root/reference/nndet/core/boxes/matcher/atss.py:22-122`` and
``matcher/iou.py:20-110``) as pure functions over padded GT arrays:

* GT boxes come in fixed-size arrays ``[G, 2*dim]`` with a boolean validity
  mask; invalid rows can never produce matches.
* Output is ``matched_idx [A]`` with the reference's sentinels: ``>= 0`` is the
  index of the matched GT box, ``-1`` background, ``-2`` between-thresholds
  (ignore). No ragged per-image lists — callers gather labels/boxes and mask.

Everything is jit-safe and vmappable over a batch axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nndetection_tpu.core.boxes.ops import (
    box_center,
    box_center_dist,
    box_iou,
    center_in_boxes,
)

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2
_NEG_INF = -100.0  # matches reference INF=100 trick; IoU values are <= 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MatchResult:
    """Result of matching anchors against one image's (padded) GT boxes."""

    matched_idx: jnp.ndarray  # [A] int32; >=0 gt index, -1 bg, -2 ignore


class ATSSMatcher:
    """Adaptive Training Sample Selection (arXiv:1912.02424).

    For every GT box: select the ``num_candidates * num_anchors_per_loc``
    center-closest anchors on each pyramid level, compute the adaptive IoU
    threshold ``mean + std`` over those candidates, mark candidates at/above
    the threshold positive (optionally requiring the anchor center inside the
    GT), and resolve multi-assignment by highest IoU.
    """

    def __init__(
        self,
        num_candidates: int = 4,
        center_in_gt: bool = False,
        min_dist: float = 0.01,
        approx_topk: bool = True,
    ):
        """``approx_topk`` selects distance candidates with
        ``jax.lax.approx_min_k`` (TPU partial-reduction top-k, recall ~0.95;
        exact fallback on other backends). The candidates only seed the
        adaptive mean+std IoU threshold, so near-boundary candidate swaps do
        not change the assignment semantics meaningfully, while exact top-k
        sorts the full per-level anchor axis."""
        self.num_candidates = num_candidates
        self.center_in_gt = center_in_gt
        self.min_dist = min_dist
        self.approx_topk = approx_topk

    def __call__(
        self,
        gt_boxes: jnp.ndarray,
        gt_mask: jnp.ndarray,
        anchors: jnp.ndarray,
        num_anchors_per_level: Sequence[int],
        num_anchors_per_loc: int,
    ) -> MatchResult:
        """
        Args:
            gt_boxes: padded GT boxes ``[G, 2*dim]``
            gt_mask: validity of each GT row ``[G]``
            anchors: all anchors, levels concatenated ``[A, 2*dim]``
            num_anchors_per_level: static per-level anchor counts
            num_anchors_per_loc: static anchors per grid position
        """
        num_gt = gt_boxes.shape[0]
        num_anchors = anchors.shape[0]
        assert sum(num_anchors_per_level) == num_anchors

        distances, _, anchor_centers = box_center_dist(gt_boxes, anchors)

        # per-level top-k closest anchors (static k per level)
        candidate_idx = []
        start = 0
        for apl in num_anchors_per_level:
            k = min(self.num_candidates * num_anchors_per_loc, apl)
            level_d = distances[:, start : start + apl]
            if self.approx_topk and apl > 64 * k:
                _, idx = jax.lax.approx_min_k(level_d, k)
            else:
                _, idx = jax.lax.top_k(-level_d, k)
            candidate_idx.append(idx + start)
            start += apl
        candidate_idx = jnp.concatenate(candidate_idx, axis=1)  # [G, K]

        ious = box_iou(gt_boxes, anchors)  # [G, A]
        cand_ious = jnp.take_along_axis(ious, candidate_idx, axis=1)  # [G, K]

        mean = jnp.mean(cand_ious, axis=1)
        std = jnp.std(cand_ious, axis=1, ddof=1) if cand_ious.shape[1] > 1 else 0.0
        thresh = mean + std  # [G]
        is_pos = cand_ious >= thresh[:, None]

        if self.center_in_gt:
            cand_centers = anchor_centers[candidate_idx.reshape(-1)]
            cand_boxes = jnp.repeat(gt_boxes, candidate_idx.shape[1], axis=0)
            in_gt = center_in_boxes(cand_centers, cand_boxes, eps=self.min_dist)
            is_pos = is_pos & in_gt.reshape(is_pos.shape)

        is_pos = is_pos & gt_mask[:, None]

        # resolve: each anchor goes to the positive GT with the highest IoU
        overlaps_inf = jnp.full((num_gt, num_anchors), _NEG_INF, dtype=jnp.float32)
        gt_rows = jnp.broadcast_to(
            jnp.arange(num_gt)[:, None], candidate_idx.shape
        )
        overlaps_inf = overlaps_inf.at[gt_rows, candidate_idx].max(
            jnp.where(is_pos, cand_ious, _NEG_INF)
        )
        matched_vals = jnp.max(overlaps_inf, axis=0)
        matches = jnp.argmax(overlaps_inf, axis=0).astype(jnp.int32)
        matches = jnp.where(
            matched_vals <= _NEG_INF, jnp.int32(BELOW_LOW_THRESHOLD), matches
        )
        return MatchResult(matched_idx=matches)


class IoUMatcher:
    """Classic IoU-threshold matching (torchvision-style semantics)."""

    def __init__(
        self,
        low_threshold: float,
        high_threshold: float,
        allow_low_quality_matches: bool = True,
    ):
        assert low_threshold <= high_threshold
        self.low_threshold = low_threshold
        self.high_threshold = high_threshold
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self,
        gt_boxes: jnp.ndarray,
        gt_mask: jnp.ndarray,
        anchors: jnp.ndarray,
        num_anchors_per_level: Sequence[int] = None,
        num_anchors_per_loc: int = None,
    ) -> MatchResult:
        num_gt = gt_boxes.shape[0]
        ious = box_iou(gt_boxes, anchors)  # [G, A]
        # invalid GT rows must never win the argmax
        ious = jnp.where(gt_mask[:, None], ious, -1.0)

        matched_vals = jnp.max(ious, axis=0)
        matches = jnp.argmax(ious, axis=0).astype(jnp.int32)
        all_matches = matches

        below = matched_vals < self.low_threshold
        between = (matched_vals >= self.low_threshold) & (
            matched_vals < self.high_threshold
        )
        matches = jnp.where(below, jnp.int32(BELOW_LOW_THRESHOLD), matches)
        matches = jnp.where(between, jnp.int32(BETWEEN_THRESHOLDS), matches)

        if self.allow_low_quality_matches:
            # for each valid gt: its best anchor gets matched back (ties excluded,
            # later gt wins conflicts — reference scatter order semantics)
            best_pred_idx = jnp.argmax(ious, axis=1)  # [G]
            scatter_idx = jnp.where(gt_mask, best_pred_idx, ious.shape[1])
            matches = matches.at[scatter_idx].set(
                jnp.arange(num_gt, dtype=jnp.int32), mode="drop"
            )
        return MatchResult(matched_idx=matches)


def gather_matched(
    match: MatchResult,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-anchor training targets from a match result.

    Mirrors ``assign_targets_to_anchors``
    (``/root/reference/nndet/core/retina.py:228-290``): labels are
    ``gt_class + 1`` for matched anchors, ``0`` background, ``-1`` ignore.

    The per-anchor row gather over millions of anchors is expressed as a
    one-hot (A x G) contraction — a small MXU matmul — because TPU gathers
    fetch a full memory tile per element.

    Returns:
        ``(labels [A] int32, matched_boxes [A, 2*dim])``
    """
    idx = jnp.clip(match.matched_idx, min=0)
    num_gt = gt_boxes.shape[0]
    oh = jax.nn.one_hot(idx, num_gt, dtype=jnp.float32)  # [A, G]
    matched_boxes = oh @ gt_boxes.astype(jnp.float32)  # [A, 2*dim]
    labels = (oh @ (gt_classes.astype(jnp.float32) + 1.0)).astype(jnp.int32)
    labels = jnp.where(match.matched_idx == BELOW_LOW_THRESHOLD, 0, labels)
    labels = jnp.where(match.matched_idx == BETWEEN_THRESHOLDS, -1, labels)
    return labels, matched_boxes
