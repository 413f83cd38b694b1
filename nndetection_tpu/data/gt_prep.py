"""On-device GT preparation: augmented instance seg -> training targets.

The jitted equivalent of the reference's GPU ``pre_trafo``
(``/root/reference/nndet/ptmodule/retinaunet/base.py:114-131``:
FindInstances -> Instances2Boxes -> Instances2Segmentation): derive padded GT
boxes + classes + masks and the semantic segmentation from the (augmented)
instance segmentation, entirely inside the train step.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nndetection_tpu.data.instances import instances_to_boxes, instances_to_semantic


def prepare_targets(
    images: jnp.ndarray,
    seg_instances: jnp.ndarray,
    instance_classes: jnp.ndarray,
    min_box_size: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """
    Args:
        images: ``[B, *patch, C]``
        seg_instances: ``[B, *patch]`` int instance ids (0 bg, -1 outside)
        instance_classes: ``[B, max_instances]`` class per instance id
            (row i -> id i+1), -1 for absent ids

    Returns:
        training batch dict: images, gt_boxes ``[B, G, 2*dim]``, gt_classes
        ``[B, G]``, gt_mask ``[B, G]``, seg ``[B, *patch]`` semantic.
    """
    max_instances = instance_classes.shape[1]

    def one(seg, table):
        boxes, present = instances_to_boxes(seg, max_instances)
        # instances cut to slivers by the crop are dropped like the reference's
        # min-size filter on found instances
        sizes_ok = jnp.all(
            jnp.stack(
                [boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]]
                + ([boxes[:, 5] - boxes[:, 4]] if boxes.shape[1] == 6 else []),
                axis=-1,
            )
            >= min_box_size,
            axis=-1,
        )
        valid = present & sizes_ok & (table >= 0)
        classes = jnp.clip(table, 0)
        semantic = instances_to_semantic(seg, table.astype(jnp.int32))
        # outside-mask voxels (-1) become background for the seg loss
        semantic = jnp.clip(semantic, 0)
        return boxes, classes, valid, semantic

    boxes, classes, valid, semantic = jax.vmap(one)(seg_instances, instance_classes)
    return {
        "images": images,
        "gt_boxes": boxes,
        "gt_classes": classes,
        "gt_mask": valid,
        "seg": semantic,
    }
