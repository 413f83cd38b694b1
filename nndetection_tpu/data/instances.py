"""Instance-segmentation utilities: instances -> boxes / semantic seg.

NumPy versions for preprocessing & evaluation plus jnp versions for the
on-device GT pre-transform (reference
``/root/reference/nndet/io/transforms/instances.py:26-357``).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def instances_to_boxes_np(
    seg: np.ndarray, instance_ids: Optional[Sequence[int]] = None
) -> Tuple[np.ndarray, List[int]]:
    """Bounding boxes of labelled instances.

    Args:
        seg: instance segmentation ``[*spatial]`` (0 background, >0 ids)

    Returns:
        ``(boxes [N, 2*dim] in interleaved corner format, ids)``; exclusive
        upper corners (``hi = max_index + 1``) like the reference
        (``instances.py:138-213``).
    """
    if instance_ids is None:
        instance_ids = [int(i) for i in np.unique(seg) if i > 0]
    boxes = []
    kept = []
    for iid in instance_ids:
        idx = np.where(seg == iid)
        if len(idx[0]) == 0:
            continue
        lo = [int(a.min()) for a in idx]
        hi = [int(a.max()) + 1 for a in idx]
        if seg.ndim == 2:
            boxes.append([lo[0], lo[1], hi[0], hi[1]])
        else:
            boxes.append([lo[0], lo[1], hi[0], hi[1], lo[2], hi[2]])
        kept.append(iid)
    if not boxes:
        return np.zeros((0, 2 * seg.ndim), dtype=np.float64), []
    return np.asarray(boxes, dtype=np.float64), kept


def instances_to_segmentation_np(
    seg: np.ndarray, instance_classes: Dict[int, int]
) -> np.ndarray:
    """Map instance ids to semantic classes (classes start at 1, 0 bg)."""
    out = np.zeros_like(seg, dtype=np.int16)
    for iid, cls in instance_classes.items():
        out[seg == iid] = cls + 1
    out[seg == -1] = -1
    return out


def instances_to_boxes(
    seg: jnp.ndarray, max_instances: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jitted instances->boxes over a fixed instance-id budget.

    The on-device equivalent of ``FindInstances`` + ``Instances2Boxes``
    (``instances.py:26-136``): for every candidate id in ``1..max_instances``
    compute the axis-aligned bounding box of its voxels via masked min/max
    reductions.

    Args:
        seg: instance segmentation ``[*spatial]`` int
        max_instances: static instance-id budget

    Returns:
        ``(boxes [max_instances, 2*dim], present [max_instances] bool)`` where
        row ``i`` corresponds to instance id ``i+1``.
    """
    dim = seg.ndim
    shape = seg.shape
    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, d) for d in range(dim)
    ]

    def one(iid):
        mask = seg == iid
        present = jnp.any(mask)
        los, his = [], []
        for d in range(dim):
            c = coords[d]
            lo = jnp.min(jnp.where(mask, c, shape[d]))
            hi = jnp.max(jnp.where(mask, c, -1)) + 1
            los.append(lo)
            his.append(hi)
        if dim == 2:
            box = jnp.stack([los[0], los[1], his[0], his[1]])
        else:
            box = jnp.stack([los[0], los[1], his[0], his[1], los[2], his[2]])
        return box.astype(jnp.float32), present

    ids = jnp.arange(1, max_instances + 1)
    boxes, present = jax.vmap(one)(ids)
    boxes = jnp.where(present[:, None], boxes, 0.0)
    return boxes, present


def instances_to_semantic(
    seg: jnp.ndarray, instance_classes: jnp.ndarray
) -> jnp.ndarray:
    """Map instance ids to semantic classes on device.

    Implemented as an unrolled compare-accumulate over the (small, static)
    instance budget instead of a table gather — volumetric gathers fetch a
    whole memory tile per element on TPU.

    Args:
        seg: ``[*spatial]`` instance ids (0 bg, -1 outside mask)
        instance_classes: ``[max_instances]`` class per id (class ids from 0)

    Returns:
        semantic seg with classes from 1, 0 background, -1 kept.
    """
    classes1 = instance_classes.astype(jnp.int32) + 1
    out = jnp.zeros(seg.shape, jnp.int32)
    for i in range(instance_classes.shape[0]):
        out = out + jnp.where(seg == i + 1, classes1[i], 0)
    return jnp.where(seg < 0, seg, out)
