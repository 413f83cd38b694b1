"""Detection and segmentation heads.

Reference semantics:
* classifier/regressor towers shared across pyramid levels with a per-level
  learnable scale on the regressor output
  (``/root/reference/nndet/arch/heads/classifier.py:64-230``,
  ``regressor.py:51-313``); prior-prob bias init on the classifier out-conv.
* segmenter: 1x1 conv on the highest-resolution decoder map
  (``segmenter.py:51-290``); FgBg variant collapses classes.

Outputs are channel-last and flattened position-major with per-location
anchors innermost, matching the anchor grid layout of
:mod:`nndetection_tpu.core.boxes.anchors`.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from nndetection_tpu.models.conv import ConvNormAct, conv_layer
from nndetection_tpu.parallel.spatial import gather_spatial, get_spatial_axis


def _level_flat_gather(y: jnp.ndarray) -> jnp.ndarray:
    """Under spatial partitioning, all-gather a level's flattened
    ``[N, A_local, C]`` output into the global anchor ordering. The anchor
    grid is z-major and the volume is sharded along z, so each shard's
    flattened block is a contiguous slice of the global order — a tiled
    all-gather along axis 1 reproduces it exactly."""
    ax = get_spatial_axis()
    if ax is None:
        return y
    return gather_spatial(y, axis_name=ax, spatial_axis=1)


class ConvTower(nn.Module):
    """in-conv -> num_convs internal convs (shared across levels)."""

    internal_channels: int
    num_convs: int = 1
    dim: int = 3
    norm: str = "group"
    norm_channels_per_group: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(1 + self.num_convs):
            x = ConvNormAct(
                out_channels=self.internal_channels,
                kernel_size=3,
                dim=self.dim,
                norm=self.norm,
                norm_channels_per_group=self.norm_channels_per_group,
                act="relu",
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
        return x


class Classifier(nn.Module):
    """Classification subnetwork emitting ``[N, A_level, num_classes]`` logits
    per level with prior-probability bias initialization."""

    num_classes: int
    anchors_per_pos: int
    internal_channels: int = 128
    num_convs: int = 1
    prior_prob: Optional[float] = 0.01
    dim: int = 3
    norm: str = "group"
    norm_channels_per_group: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> jnp.ndarray:
        tower = ConvTower(
            internal_channels=self.internal_channels,
            num_convs=self.num_convs,
            dim=self.dim,
            norm=self.norm,
            norm_channels_per_group=self.norm_channels_per_group,
            dtype=self.dtype,
            name="tower",
        )
        bias_init = nn.initializers.zeros
        if self.prior_prob is not None:
            bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
            bias_init = nn.initializers.constant(bias_value)
        out_conv = conv_layer(
            features=self.anchors_per_pos * self.num_classes,
            kernel_size=3,
            dim=self.dim,
            use_bias=True,
            bias_init=bias_init,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="out",
        )
        logits = []
        for fm in fmaps:
            y = out_conv(tower(fm))
            n = y.shape[0]
            logits.append(_level_flat_gather(y.reshape(n, -1, self.num_classes)))
        return jnp.concatenate(logits, axis=1)  # [N, A_total, C]


class Regressor(nn.Module):
    """Regression subnetwork emitting ``[N, A_level, 2*dim]`` deltas per level,
    optionally scaled by a learnable per-level scalar."""

    anchors_per_pos: int
    internal_channels: int = 128
    num_convs: int = 1
    learn_scale: bool = True
    dim: int = 3
    norm: str = "group"
    norm_channels_per_group: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> jnp.ndarray:
        tower = ConvTower(
            internal_channels=self.internal_channels,
            num_convs=self.num_convs,
            dim=self.dim,
            norm=self.norm,
            norm_channels_per_group=self.norm_channels_per_group,
            dtype=self.dtype,
            name="tower",
        )
        out_conv = conv_layer(
            features=self.anchors_per_pos * 2 * self.dim,
            kernel_size=3,
            dim=self.dim,
            use_bias=True,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="out",
        )
        if self.learn_scale:
            scales = self.param(
                "scales", nn.initializers.ones, (len(fmaps),), jnp.float32
            )
        deltas = []
        for level, fm in enumerate(fmaps):
            y = out_conv(tower(fm))
            if self.learn_scale:
                y = y * scales[level].astype(y.dtype)
            n = y.shape[0]
            deltas.append(_level_flat_gather(y.reshape(n, -1, 2 * self.dim)))
        return jnp.concatenate(deltas, axis=1)  # [N, A_total, 2*dim]


class Segmenter(nn.Module):
    """Auxiliary segmentation head on the highest-resolution decoder map.

    ``seg_classes`` counts foreground classes; output has ``seg_classes + 1``
    channels (background first). The FgBg collapse happens in the loss, not
    here."""

    seg_classes: int = 1
    internal_channels: Optional[int] = None
    num_internal: int = 0
    dim: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> jnp.ndarray:
        x = fmaps[0]
        for i in range(self.num_internal):
            x = ConvNormAct(
                out_channels=self.internal_channels or x.shape[-1],
                kernel_size=3,
                dim=self.dim,
                norm=self.norm,
                act="relu",
                dtype=self.dtype,
                name=f"internal{i}",
            )(x)
        logits = nn.Conv(
            features=self.seg_classes + 1,
            kernel_size=(1,) * self.dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )(x)
        return logits  # [N, *spatial, seg_classes + 1]


class DeepSupervisionSegmenter(nn.Module):
    """Segmentation heads on several decoder levels for deep supervision
    (reference ``DeepSupervisionSegmenterFGBG``, ``segmenter.py:399``).

    Returns one logits map per supervised level (highest resolution first);
    the loss downsamples the GT to each level
    (:func:`nndetection_tpu.losses.deep_supervision_seg_loss`-style maxpool).
    """

    seg_classes: int = 1
    num_levels: int = 3
    dim: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        for level in range(min(self.num_levels, len(fmaps))):
            outs.append(
                nn.Conv(
                    features=self.seg_classes + 1,
                    kernel_size=(1,) * self.dim,
                    use_bias=True,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"out_P{level}",
                )(fmaps[level])
            )
        return outs
