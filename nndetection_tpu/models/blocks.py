"""Conv block families (reference ``/root/reference/nndet/arch/blocks/basic.py``).

``StackedConvBlock2`` is the published default encoder block: two
conv-norm-act layers, the first carrying the stage stride.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from nndetection_tpu.models.conv import ConvNormAct, Kernel


class StackedConvBlock(nn.Module):
    """``num_convs`` conv-norm-act layers; the first is strided."""

    out_channels: int
    conv_kernel: Kernel = 3
    stride: Optional[Kernel] = None
    num_convs: int = 2
    dim: int = 3
    norm: str = "instance"
    act: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_convs):
            stride = self.stride if (i == 0 and self.stride is not None) else 1
            x = ConvNormAct(
                out_channels=self.out_channels,
                kernel_size=self.conv_kernel,
                strides=stride,
                dim=self.dim,
                norm=self.norm,
                act=self.act,
                dtype=self.dtype,
            )(x)
        return x


class StackedResidualBlock(nn.Module):
    """Residual variant (``blocks/basic.py:183``): shortcut is a strided 1x1
    conv + norm when shape changes."""

    out_channels: int
    conv_kernel: Kernel = 3
    stride: Optional[Kernel] = None
    num_convs: int = 2
    dim: int = 3
    norm: str = "instance"
    act: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = x
        for i in range(self.num_convs):
            stride = self.stride if (i == 0 and self.stride is not None) else 1
            last = i == self.num_convs - 1
            y = ConvNormAct(
                out_channels=self.out_channels,
                kernel_size=self.conv_kernel,
                strides=stride,
                dim=self.dim,
                norm=self.norm,
                act=None if last else self.act,
                dtype=self.dtype,
            )(y)
        needs_proj = (identity.shape[-1] != self.out_channels) or (
            self.stride is not None
            and any(s != 1 for s in (self.stride if not isinstance(self.stride, int) else [self.stride]))
        )
        if needs_proj:
            identity = ConvNormAct(
                out_channels=self.out_channels,
                kernel_size=1,
                strides=self.stride if self.stride is not None else 1,
                dim=self.dim,
                norm=self.norm,
                act=None,
                dtype=self.dtype,
            )(identity)
        return nn.relu(y + identity)


class SELayer(nn.Module):
    """Squeeze-and-excitation (``blocks/se.py:28``)."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x.astype(jnp.float32), axis=axes)
        from nndetection_tpu.parallel.spatial import get_spatial_axis

        ax = get_spatial_axis()
        if ax is not None:
            # squeeze spans the global volume under spatial partitioning
            import jax

            s = jax.lax.pmean(s, ax)
        s = nn.Dense(max(1, c // self.reduction), dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.sigmoid(s)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        return x * s.reshape(shape).astype(x.dtype)
