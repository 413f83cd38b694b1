"""Test-time augmentation: mirror transforms with box-aware inversion
(reference ``/root/reference/nndet/inference/transforms.py:25-73`` and
``nndet/io/transforms/spatial.py:24-208``).

In 3D the full set is the identity + 7 axis-flip combinations. Flipping axis
``a`` maps a box span ``[lo, hi)`` to ``[S_a - hi, S_a - lo)``.
"""
from __future__ import annotations

from itertools import combinations
from typing import List, Sequence, Tuple

import numpy as np


def get_tta_flips(dim: int = 3, enabled: bool = True) -> List[Tuple[int, ...]]:
    """All flip-axis combinations, identity first."""
    if not enabled:
        return [()]
    axes = list(range(dim))
    out: List[Tuple[int, ...]] = [()]
    for r in range(1, dim + 1):
        out.extend(tuple(c) for c in combinations(axes, r))
    return out


def flip_image(images: np.ndarray, flips: Sequence[int], spatial_offset: int = 1):
    """Flip spatial axes of ``[..., *spatial, C]``-like arrays; works for both
    numpy and jax arrays (jnp.flip has the same signature)."""
    if not flips:
        return images
    axes = tuple(f + spatial_offset for f in flips)
    if isinstance(images, np.ndarray):
        return np.flip(images, axis=axes)
    import jax.numpy as jnp

    return jnp.flip(images, axis=axes)


def invert_boxes(
    boxes: np.ndarray, flips: Sequence[int], patch_size: Sequence[int]
) -> np.ndarray:
    """Map boxes predicted on a flipped tile back to unflipped coordinates."""
    if not len(flips) or len(boxes) == 0:
        return boxes
    out = np.array(boxes, copy=True)
    lo_idx = {0: 0, 1: 1, 2: 4}
    hi_idx = {0: 2, 1: 3, 2: 5}
    for a in flips:
        s = patch_size[a]
        lo = out[..., lo_idx[a]].copy()
        hi = out[..., hi_idx[a]].copy()
        out[..., lo_idx[a]] = s - hi
        out[..., hi_idx[a]] = s - lo
    return out


def invert_seg(seg: np.ndarray, flips: Sequence[int], spatial_offset: int = 1):
    """Inverse mirror for segmentation maps (self-inverse)."""
    return flip_image(seg, flips, spatial_offset)


def invert_boxes_jnp(boxes, flips: Sequence[int], patch_size: Sequence[int]):
    """Jit-friendly :func:`invert_boxes`: the per-axis lo/hi swap + offset is
    precomputed as a static (permutation, sign, offset) triple so the traced op
    is one gather + multiply-add over the box columns."""
    import jax.numpy as jnp

    dim = len(patch_size)
    n_cols = 2 * dim
    lo_idx = {0: 0, 1: 1, 2: 4}
    hi_idx = {0: 2, 1: 3, 2: 5}
    perm = np.arange(n_cols)
    sign = np.ones(n_cols, np.float32)
    offset = np.zeros(n_cols, np.float32)
    for a in flips:
        lo, hi = lo_idx[a], hi_idx[a]
        perm[lo], perm[hi] = hi, lo
        sign[lo] = sign[hi] = -1.0
        offset[lo] = offset[hi] = float(patch_size[a])
    return boxes[..., perm] * jnp.asarray(sign) + jnp.asarray(offset)
