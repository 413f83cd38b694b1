"""Anchor grid generation.

TPU-first redesign of the reference's runtime-cached anchor generators
(``/root/reference/nndet/core/boxes/anchors.py:95-180,472-559``): anchor grids
depend only on (static) feature-map shapes, strides and the planned per-level
anchor sizes, so they are precomputed in NumPy and folded into the jitted train
step as constants (SURVEY.md §7.1.2) instead of being regenerated and cached on
device at runtime.

Parametrization follows the planner's "S" variant: per level, explicit size
tuples along each spatial axis; cell anchors are all combinations, centered at
zero. Grid anchor ordering is row-major over spatial positions with the
per-location anchors innermost — exactly the layout the detection heads emit
after flattening ``(s0, s1, s2, A, C)``.
"""
from __future__ import annotations

from itertools import product
from typing import List, Sequence, Tuple, Union

import numpy as np

SizeSpec = Union[int, float, Sequence[Union[int, float]]]


def _as_tuples(spec: Sequence[SizeSpec]) -> List[Tuple[float, ...]]:
    out = []
    for s in spec:
        if isinstance(s, (int, float)):
            out.append((float(s),))
        else:
            out.append(tuple(float(v) for v in s))
    return out


class AnchorGenerator:
    def __init__(
        self,
        width: Sequence[SizeSpec],
        height: Sequence[SizeSpec],
        depth: Sequence[SizeSpec] = None,
        **unused,
    ):
        """
        Args:
            width/height/depth: anchor extents along spatial axes 0/1/2, one
                entry (scalar or tuple) per pyramid level. ``depth=None``
                selects 2D anchors.
        """
        self.width = _as_tuples(width)
        self.height = _as_tuples(height)
        self.depth = _as_tuples(depth) if depth is not None else None
        self.dim = 3 if depth is not None else 2
        if self.depth is not None:
            assert len(self.width) == len(self.height) == len(self.depth)
        else:
            assert len(self.width) == len(self.height)

    @property
    def num_levels(self) -> int:
        return len(self.width)

    def num_anchors_per_location(self) -> List[int]:
        """Anchors per grid position for each level."""
        if self.dim == 2:
            return [len(w) * len(h) for w, h in zip(self.width, self.height)]
        return [
            len(w) * len(h) * len(d)
            for w, h, d in zip(self.width, self.height, self.depth)
        ]

    def cell_anchors(self, level: int) -> np.ndarray:
        """Zero-centered anchors ``[A, 2*dim]`` for one level."""
        if self.dim == 2:
            sizes = np.array(
                list(product(self.width[level], self.height[level])), dtype=np.float32
            )
            half = sizes / 2.0
            return np.stack(
                [-half[:, 0], -half[:, 1], half[:, 0], half[:, 1]], axis=1
            )
        sizes = np.array(
            list(product(self.width[level], self.height[level], self.depth[level])),
            dtype=np.float32,
        )
        half = sizes / 2.0
        return np.stack(
            [
                -half[:, 0],
                -half[:, 1],
                half[:, 0],
                half[:, 1],
                -half[:, 2],
                half[:, 2],
            ],
            axis=1,
        )

    def grid_anchors(
        self,
        feature_shapes: Sequence[Sequence[int]],
        strides: Sequence[Sequence[int]],
    ) -> Tuple[np.ndarray, List[int]]:
        """Generate anchors for all levels.

        Args:
            feature_shapes: spatial shape of each pyramid level.
            strides: cumulative stride of each level w.r.t. the input.

        Returns:
            ``(anchors [sum_l prod(shape_l)*A_l, 2*dim], anchors_per_level)``
        """
        assert len(feature_shapes) == len(strides) == self.num_levels
        all_anchors = []
        per_level = []
        for level, (shape, stride) in enumerate(zip(feature_shapes, strides)):
            cell = self.cell_anchors(level)  # [A, 2*dim]
            axes = [
                np.arange(s, dtype=np.float32) * float(st)
                for s, st in zip(shape, stride)
            ]
            grids = np.meshgrid(*axes, indexing="ij")
            ctr = np.stack([g.reshape(-1) for g in grids], axis=1)  # [P, dim]
            if self.dim == 2:
                shifts = ctr[:, [0, 1, 0, 1]]
            else:
                shifts = ctr[:, [0, 1, 0, 1, 2, 2]]
            anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 2 * self.dim)
            all_anchors.append(anchors)
            per_level.append(anchors.shape[0])
        return np.concatenate(all_anchors, axis=0).astype(np.float32), per_level


def compute_anchors_for_strides(
    anchors: np.ndarray,
    strides: Sequence[Union[Sequence[float], float]],
    cat: bool,
) -> Union[List[np.ndarray], np.ndarray]:
    """Scale stride-0 anchors to follow a sequence of (relative) strides.

    Mirrors ``/root/reference/nndet/core/boxes/anchors.py:40-68``.
    """
    anchors = np.asarray(anchors, dtype=np.float32)
    dim = anchors.shape[1] // 2
    out = [anchors]
    for stride in strides:
        if isinstance(stride, (int, float)):
            stride = [stride] * dim
        fmt = [stride[0], stride[1], stride[0], stride[1]]
        if dim == 3:
            fmt.extend([stride[2], stride[2]])
        out.append(anchors * np.asarray(fmt, dtype=np.float32)[None])
    if cat:
        return np.concatenate(out, axis=0)
    return out
