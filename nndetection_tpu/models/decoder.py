"""U-FPN decoder.

Reference semantics (``/root/reference/nndet/arch/decoder/base.py:28-417``):
lateral 1x1 convs, top-down pathway with transposed-conv (or nearest)
upsampling and elementwise addition, optional fusion/out convs. Channels are
``fixed_out_channels`` at/above ``min(decoder_levels)`` and halve below
(min ``min_out_channels``) — the U-Net-like high-resolution tail feeding the
segmentation head.

Faithfully reproduces the reference detail that ``UFPNModular`` overrides the
out-conv count with ``num_fusion`` (``decoder/base.py:393-400``), so the
published default has *no* fusion or out convolutions.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from nndetection_tpu.models.conv import ConvNormAct, Kernel


def ufpn_out_channels(
    num_levels: int,
    decoder_levels: Optional[Sequence[int]],
    fixed_out_channels: int,
    min_out_channels: int = 8,
) -> List[int]:
    """Per-level output channels (``decoder/base.py:181-198``)."""
    out = [fixed_out_channels] * num_levels
    if decoder_levels is not None:
        lowest = min(decoder_levels)
        for level in reversed(range(lowest)):
            out[level] = max(min_out_channels, out[level + 1] // 2)
    return out


def _stride_ratios(strides: Sequence[Sequence[int]], dim: int) -> List[Tuple[int, ...]]:
    s = [tuple([v] * dim) if isinstance(v, int) else tuple(v) for v in strides]
    return [
        tuple(int(b / a) for a, b in zip(s[i - 1], s[i])) for i in range(1, len(s))
    ]


class UFPN(nn.Module):
    """Modular U-FPN over a list of encoder feature maps (high res first)."""

    strides: Tuple[Kernel, ...]  # absolute stride per level
    conv_kernels: Tuple[Kernel, ...]
    decoder_levels: Optional[Tuple[int, ...]]
    fixed_out_channels: int
    min_out_channels: int = 8
    upsampling_mode: str = "transpose"  # "transpose" | "nearest"
    num_lateral: int = 1
    norm_lateral: bool = False
    activation_lateral: bool = False
    num_out: int = 0  # reference default behavior: num_out ignored, fusion=0
    norm_out: bool = False
    activation_out: bool = False
    num_fusion: int = 0
    norm_fusion: bool = False
    activation_fusion: bool = False
    dim: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    def _conv(self, out_ch, kernel, use_norm, use_act, name, transposed=False, stride=1):
        return ConvNormAct(
            out_channels=out_ch,
            kernel_size=kernel,
            strides=stride,
            dim=self.dim,
            norm=self.norm if use_norm else None,
            act="relu" if use_act else None,
            transposed=transposed,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        num_levels = len(fmaps)
        out_channels = ufpn_out_channels(
            num_levels, self.decoder_levels, self.fixed_out_channels, self.min_out_channels
        )
        ratios = _stride_ratios(self.strides, self.dim)

        # lateral connections
        lat = []
        for level, fm in enumerate(fmaps):
            x = fm
            for i in range(self.num_lateral):
                x = self._conv(
                    out_channels[level], 1, self.norm_lateral, self.activation_lateral,
                    name=f"lateral_P{level}_{i}",
                )(x)
            lat.append(x)

        # top-down pathway
        outs: List[Optional[jnp.ndarray]] = [None] * num_levels
        up = None
        for level in reversed(range(num_levels)):
            x = lat[level]
            if up is not None:
                x = x + up
                for i in range(self.num_fusion):
                    x = self._conv(
                        out_channels[level], self.conv_kernels[level],
                        self.norm_fusion, self.activation_fusion,
                        name=f"fusion_P{level}_{i}",
                    )(x)
            if level > 0:
                ratio = ratios[level - 1]
                if self.upsampling_mode == "transpose":
                    up = self._conv(
                        out_channels[level - 1], ratio, False, False,
                        name=f"up_P{level}", transposed=True, stride=ratio,
                    )(x)
                else:
                    rep = x
                    for axis, r in enumerate(ratio):
                        rep = jnp.repeat(rep, r, axis=axis + 1)
                    if out_channels[level] != out_channels[level - 1]:
                        rep = self._conv(
                            out_channels[level - 1], 1, False, False,
                            name=f"up_P{level}",
                        )(rep)
                    up = rep
            outs[level] = x

        # out convolutions (reference: count == num_fusion, default none)
        final = []
        for level, x in enumerate(outs):
            for i in range(self.num_fusion):
                x = self._conv(
                    out_channels[level], self.conv_kernels[level],
                    self.norm_fusion, self.activation_fusion,
                    name=f"out_P{level}_{i}",
                )(x)
            final.append(x)
        return final


class PAUFPN(UFPN):
    """U-FPN with an additional bottom-up path-aggregation pass
    (``/root/reference/nndet/arch/decoder/base.py:420-578``): after the
    top-down pathway, features are re-propagated high-res -> low-res with
    strided convs and elementwise addition."""

    @nn.compact
    def __call__(self, fmaps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        num_levels = len(fmaps)
        out_channels = ufpn_out_channels(
            num_levels, self.decoder_levels, self.fixed_out_channels, self.min_out_channels
        )
        ratios = _stride_ratios(self.strides, self.dim)

        lat = []
        for level, fm in enumerate(fmaps):
            x = fm
            for i in range(self.num_lateral):
                x = self._conv(
                    out_channels[level], 1, self.norm_lateral, self.activation_lateral,
                    name=f"lateral_P{level}_{i}",
                )(x)
            lat.append(x)

        # top-down
        td: List[Optional[jnp.ndarray]] = [None] * num_levels
        up = None
        for level in reversed(range(num_levels)):
            x = lat[level]
            if up is not None:
                x = x + up
                for i in range(self.num_fusion):
                    x = self._conv(
                        out_channels[level], self.conv_kernels[level],
                        self.norm_fusion, self.activation_fusion,
                        name=f"fusion_P{level}_{i}",
                    )(x)
            if level > 0:
                ratio = ratios[level - 1]
                up = self._conv(
                    out_channels[level - 1], ratio, False, False,
                    name=f"up_P{level}", transposed=True, stride=ratio,
                )(x)
            td[level] = x

        # bottom-up path aggregation
        outs: List[Optional[jnp.ndarray]] = [None] * num_levels
        down = None
        for level in range(num_levels):
            x = td[level]
            if down is not None:
                x = x + down
                for i in range(max(self.num_fusion, 1)):
                    x = self._conv(
                        out_channels[level], self.conv_kernels[level],
                        self.norm_fusion, self.activation_fusion,
                        name=f"pa_fusion_P{level}_{i}",
                    )(x)
            if level < num_levels - 1:
                ratio = ratios[level]
                down = self._conv(
                    out_channels[level + 1], self.conv_kernels[level], False, False,
                    name=f"down_P{level}", stride=ratio,
                )(x)
            outs[level] = x
        return outs
