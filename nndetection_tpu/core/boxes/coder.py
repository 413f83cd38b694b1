"""Box encode/decode between anchors and regression targets.

Semantics match the reference coder (``/root/reference/nndet/core/boxes/coder.py:21-155``):
targets are ``(dx, dy, dw, dh, (dz, dd))`` — normalized center offsets and
log size ratios, with a clip on the log-size terms before ``exp``. Unlike the
reference there is no per-image ragged list handling: everything is
``[..., N, 2*dim]`` with masks, so encode/decode are trivially vmappable and
jit-safe (the reference's zero-fill for empty-GT images becomes masking in the
loss).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp

from nndetection_tpu.core.boxes.ops import box_corners, boxes_from_corners


class BoxCoder:
    def __init__(
        self,
        weights: Optional[Sequence[float]] = None,
        bbox_xform_clip: float = math.log(1000.0 / 16),
        dim: int = 3,
    ):
        """
        Args:
            weights: per-target weights ``(wx, wy, ww, wh, (wz, wd))``;
                defaults to all ones.
            bbox_xform_clip: max value for log-size targets before exp.
            dim: number of spatial dims (2 or 3).
        """
        self.dim = dim
        if weights is None:
            weights = (1.0,) * (2 * dim)
        assert len(weights) == 2 * dim
        self.weights = tuple(float(w) for w in weights)
        self.bbox_xform_clip = float(bbox_xform_clip)

    def _center_weights(self) -> jnp.ndarray:
        # (wx, wy, (wz))
        return jnp.asarray(self.weights[0 : self.dim], dtype=jnp.float32)

    def _size_weights(self) -> jnp.ndarray:
        # (ww, wh, (wd))
        return jnp.asarray(self.weights[self.dim :], dtype=jnp.float32)

    def encode(self, reference_boxes: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
        """Encode ``reference_boxes`` (e.g. matched GT) relative to ``proposals``
        (anchors). Shapes ``[..., N, 2*dim] -> [..., N, 2*dim]`` with layout
        ``(dx, dy, dw, dh, (dz, dd))``.
        """
        ref = reference_boxes.astype(jnp.float32)
        prop = proposals.astype(jnp.float32)
        pmin, pmax = box_corners(prop)
        rmin, rmax = box_corners(ref)
        ex_size = pmax - pmin
        ex_ctr = pmin + 0.5 * ex_size
        gt_size = rmax - rmin
        gt_ctr = rmin + 0.5 * gt_size
        d_ctr = self._center_weights() * (gt_ctr - ex_ctr) / ex_size
        d_size = self._size_weights() * jnp.log(gt_size / ex_size)
        if self.dim == 2:
            return jnp.stack(
                [d_ctr[..., 0], d_ctr[..., 1], d_size[..., 0], d_size[..., 1]],
                axis=-1,
            )
        return jnp.stack(
            [
                d_ctr[..., 0],
                d_ctr[..., 1],
                d_size[..., 0],
                d_size[..., 1],
                d_ctr[..., 2],
                d_size[..., 2],
            ],
            axis=-1,
        )

    def decode(self, rel_codes: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Decode deltas relative to ``boxes`` (anchors) into corner boxes.

        Shapes ``[..., N, 2*dim] -> [..., N, 2*dim]``.
        """
        codes = rel_codes.astype(jnp.float32)
        bmin, bmax = box_corners(boxes.astype(jnp.float32))
        sizes = bmax - bmin
        ctrs = bmin + 0.5 * sizes
        if self.dim == 2:
            d_ctr = jnp.stack([codes[..., 0], codes[..., 1]], axis=-1)
            d_size = jnp.stack([codes[..., 2], codes[..., 3]], axis=-1)
        else:
            d_ctr = jnp.stack([codes[..., 0], codes[..., 1], codes[..., 4]], axis=-1)
            d_size = jnp.stack([codes[..., 2], codes[..., 3], codes[..., 5]], axis=-1)
        d_ctr = d_ctr / self._center_weights()
        d_size = jnp.clip(d_size / self._size_weights(), max=self.bbox_xform_clip)
        pred_ctr = d_ctr * sizes + ctrs
        pred_size = jnp.exp(d_size) * sizes
        return boxes_from_corners(pred_ctr - 0.5 * pred_size, pred_ctr + 0.5 * pred_size)
