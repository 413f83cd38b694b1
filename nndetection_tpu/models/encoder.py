"""Plain CNN encoder: one block per resolution stage.

Reference semantics (``/root/reference/nndet/arch/encoder/modular.py:28-157``):
per-plan conv kernels and pooling strides, channels double per stage from
``start_channels`` capped at ``max_channels`` (320 in 3D), stage 0 unstrided.
Pure function of the plan — channels/strides are static metadata usable by the
decoder and the HBM planner without tracing.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from nndetection_tpu.models.blocks import StackedConvBlock

Kernel = Union[int, Sequence[int]]


def encoder_channels(
    num_stages: int, start_channels: int, max_channels: int = 320
) -> List[int]:
    return [min(start_channels * 2**i, max_channels) for i in range(num_stages)]


def encoder_strides(
    num_stages: int, strides: Sequence[Sequence[int]], dim: int = 3
) -> List[List[int]]:
    """Cumulative stride of each stage w.r.t. the input."""
    out = [[1] * dim]
    for i in range(1, num_stages):
        s = strides[i - 1]
        s = [s] * dim if isinstance(s, int) else list(s)
        out.append([p * q for p, q in zip(out[-1], s)])
    return out


class Encoder(nn.Module):
    """Returns one feature map per stage (highest to lowest resolution)."""

    conv_kernels: Tuple[Kernel, ...]
    strides: Tuple[Kernel, ...]  # pooling strides between stages (len = stages-1)
    start_channels: int = 32
    max_channels: int = 320
    num_convs_per_stage: int = 2
    dim: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        num_stages = len(self.conv_kernels)
        channels = encoder_channels(num_stages, self.start_channels, self.max_channels)
        outputs = []
        for stage in range(num_stages):
            x = StackedConvBlock(
                out_channels=channels[stage],
                conv_kernel=self.conv_kernels[stage],
                stride=None if stage == 0 else self.strides[stage - 1],
                num_convs=self.num_convs_per_stage,
                dim=self.dim,
                norm=self.norm,
                dtype=self.dtype,
                name=f"stage{stage}",
            )(x)
            outputs.append(x)
        return outputs
