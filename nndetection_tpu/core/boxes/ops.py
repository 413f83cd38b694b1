"""Box geometry primitives (pure jnp, static shapes, vmap-friendly).

Box convention (kept byte-compatible with the reference's on-disk artifacts,
see ``/root/reference/nndet/core/boxes/ops.py:60-290`` for the semantics this
mirrors): corner-interleaved coordinates

* 2D: ``(x1, y1, x2, y2)``
* 3D: ``(x1, y1, x2, y2, z1, z2)``

where ``x``/``y``/``z`` index spatial axes 0/1/2 of the (possibly transposed)
volume. All pairwise functions take ``[..., N, 2*dim]`` and ``[..., M, 2*dim]``
and broadcast over leading axes; IoU math is forced to float32 (the reference
forces float32 under AMP for the same overflow reason).

Unlike the reference there are no data-dependent shapes: filters such as
``small_boxes_mask`` return boolean masks instead of compacted index lists so
they compose with ``jit``/``vmap``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

# corner index layout for the interleaved format
_MIN_IDX = {4: (0, 1), 6: (0, 1, 4)}
_MAX_IDX = {4: (2, 3), 6: (2, 3, 5)}


def box_dim(boxes: jnp.ndarray) -> int:
    """Number of spatial dims encoded in the last axis (4 -> 2, 6 -> 3)."""
    return boxes.shape[-1] // 2


def box_corners(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split interleaved boxes into (mins, maxs), each ``[..., dim]``."""
    c = boxes.shape[-1]
    mins = boxes[..., list(_MIN_IDX[c])]
    maxs = boxes[..., list(_MAX_IDX[c])]
    return mins, maxs


def boxes_from_corners(mins: jnp.ndarray, maxs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`box_corners`."""
    if mins.shape[-1] == 2:
        return jnp.stack(
            [mins[..., 0], mins[..., 1], maxs[..., 0], maxs[..., 1]], axis=-1
        )
    return jnp.stack(
        [
            mins[..., 0],
            mins[..., 1],
            maxs[..., 0],
            maxs[..., 1],
            mins[..., 2],
            maxs[..., 2],
        ],
        axis=-1,
    )


def box_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """Per-axis extents ``[..., dim]``."""
    mins, maxs = box_corners(boxes)
    return maxs - mins


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area (2D) / volume (3D) of boxes, float32."""
    return jnp.prod(box_size(boxes).astype(jnp.float32), axis=-1)


def box_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center points ``[..., dim]``."""
    mins, maxs = box_corners(boxes)
    return (mins + maxs) * 0.5


def box_iou_union(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise IoU and union ``[..., N, M]`` (float32)."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    mins1, maxs1 = box_corners(b1)
    mins2, maxs2 = box_corners(b2)
    lo = jnp.maximum(mins1[..., :, None, :], mins2[..., None, :, :])
    hi = jnp.minimum(maxs1[..., :, None, :], maxs2[..., None, :, :])
    inter = jnp.prod(jnp.clip(hi - lo, min=0.0), axis=-1) + eps
    area1 = jnp.prod(maxs1 - mins1, axis=-1)
    area2 = jnp.prod(maxs2 - mins2, axis=-1)
    union = area1[..., :, None] + area2[..., None, :] - inter + eps
    return inter / union, union


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Pairwise IoU matrix ``[..., N, M]``."""
    return box_iou_union(boxes1, boxes2, eps=eps)[0]


def generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Pairwise generalized IoU ``[..., N, M]`` (Rezatofighi et al.)."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    iou, union = box_iou_union(b1, b2, eps=eps)
    mins1, maxs1 = box_corners(b1)
    mins2, maxs2 = box_corners(b2)
    lo = jnp.minimum(mins1[..., :, None, :], mins2[..., None, :, :])
    hi = jnp.maximum(maxs1[..., :, None, :], maxs2[..., None, :, :])
    hull = jnp.prod(jnp.clip(hi - lo, min=0.0), axis=-1) + eps
    return iou - (hull - union) / hull


def elementwise_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """IoU of corresponding boxes (``[..., N]``), used by GIoU-style losses."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    mins1, maxs1 = box_corners(b1)
    mins2, maxs2 = box_corners(b2)
    lo = jnp.maximum(mins1, mins2)
    hi = jnp.minimum(maxs1, maxs2)
    inter = jnp.prod(jnp.clip(hi - lo, min=0.0), axis=-1)
    union = (
        jnp.prod(maxs1 - mins1, axis=-1) + jnp.prod(maxs2 - mins2, axis=-1) - inter
    )
    return (inter + eps) / (union + eps)


def elementwise_generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """GIoU of corresponding boxes (``[..., N]``)."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    mins1, maxs1 = box_corners(b1)
    mins2, maxs2 = box_corners(b2)
    lo = jnp.maximum(mins1, mins2)
    hi = jnp.minimum(maxs1, maxs2)
    inter = jnp.prod(jnp.clip(hi - lo, min=0.0), axis=-1)
    union = (
        jnp.prod(maxs1 - mins1, axis=-1) + jnp.prod(maxs2 - mins2, axis=-1) - inter
    )
    iou = (inter + eps) / (union + eps)
    lo_h = jnp.minimum(mins1, mins2)
    hi_h = jnp.maximum(maxs1, maxs2)
    hull = jnp.prod(jnp.clip(hi_h - lo_h, min=0.0), axis=-1) + eps
    return iou - (hull - union) / hull


def box_center_dist(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, euclidean: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pairwise distance of box centers.

    Returns ``(dists [..., N, M], centers1 [..., N, dim], centers2 [..., M, dim])``.
    """
    c1 = box_center(boxes1.astype(jnp.float32))
    c2 = box_center(boxes2.astype(jnp.float32))
    diff = c1[..., :, None, :] - c2[..., None, :, :]
    if euclidean:
        dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    else:
        dists = jnp.sum(diff, axis=-1)
    return dists, c1, c2


def center_in_boxes(
    centers: jnp.ndarray, boxes: jnp.ndarray, eps: float = 0.01
) -> jnp.ndarray:
    """True where ``centers[i]`` lies inside ``boxes[i]`` (elementwise, ``[..., N]``)."""
    mins, maxs = box_corners(boxes.astype(jnp.float32))
    lo = centers - mins
    hi = maxs - centers
    return jnp.min(jnp.concatenate([lo, hi], axis=-1), axis=-1) > eps


def clip_boxes_to_image(
    boxes: jnp.ndarray, image_shape: Sequence[int]
) -> jnp.ndarray:
    """Clip box coordinates into ``[0, image_shape[axis]]`` per spatial axis."""
    dim = box_dim(boxes)
    assert len(image_shape) == dim, f"need {dim} sizes, got {image_shape}"
    mins, maxs = box_corners(boxes)
    bounds = jnp.asarray(image_shape, dtype=boxes.dtype)
    mins = jnp.clip(mins, min=0, max=bounds)
    maxs = jnp.clip(maxs, min=0, max=bounds)
    return boxes_from_corners(mins, maxs)


def small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with every side ``>= min_size`` (mask form of the
    reference's ``remove_small_boxes``)."""
    return jnp.all(box_size(boxes) >= min_size, axis=-1)


def permute_boxes(boxes: jnp.ndarray, dims: Sequence[int]) -> jnp.ndarray:
    """Reorder spatial axes of boxes, e.g. for plan transpose.

    ``dims`` is the new order of spatial axes (as for ``np.transpose`` of the
    underlying volume).
    """
    mins, maxs = box_corners(boxes)
    dims = list(dims)
    return boxes_from_corners(mins[..., dims], maxs[..., dims])


def expand_to_boxes(values: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-box scalars ``[..., N]`` to ``[..., N, 2*dim]``."""
    return jnp.broadcast_to(values[..., None], boxes.shape)
