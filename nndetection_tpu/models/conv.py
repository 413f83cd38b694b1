"""Dimension-generic conv/norm/act building blocks (flax.linen, NDHWC).

TPU-first equivalent of the reference conv factory
(``/root/reference/nndet/arch/conv.py:28-500``): channel-last layout so XLA
tiles convolutions onto the MXU, bfloat16 compute with float32 parameters and
float32 normalization statistics. The two conv families used by the published
default model are provided: Conv+InstanceNorm+ReLU (backbone) and
Conv+GroupNorm+ReLU (heads); norm/act are toggleable exactly like
``conv_kwargs_helper`` in the reference.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Kernel = Union[int, Sequence[int]]


def _to_tuple(k: Kernel, dim: int) -> Tuple[int, ...]:
    if isinstance(k, int):
        return (k,) * dim
    return tuple(int(v) for v in k)


class InstanceNorm(nn.Module):
    """Instance normalization over spatial axes (per sample, per channel).

    Stats are computed in float32 regardless of input dtype.
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        # statistics accumulate in float32 WITHOUT materializing an f32 copy
        # of the activation (a full-resolution f32 cast of stage-0 maps costs
        # GBs of HBM once residuals are kept for backward). The variance uses
        # the CENTERED formula — E[x^2]-E[x]^2 cancels catastrophically for
        # high-mean/low-variance activations and produced rsqrt blow-ups —
        # with the subtraction fused in the compute dtype and the square
        # accumulated in f32.
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        diff = x - mean.astype(x.dtype)
        var = jnp.mean(jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = inv
        if self.use_scale:
            gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            scale = inv * gamma
        shift = -mean * scale
        if self.use_bias:
            beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            shift = shift + beta
        return (x * scale.astype(self.dtype) + shift.astype(self.dtype)).astype(
            self.dtype
        )


class GroupNorm(nn.Module):
    """Group normalization with a channels-per-group parametrization
    (reference ``nndet/arch/layers/norm.py:26``)."""

    channels_per_group: int = 16
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        groups = max(1, c // self.channels_per_group)
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return y.astype(self.dtype)


class ConvNormAct(nn.Module):
    """conv -> (norm) -> (act); bias disabled when a norm follows (reference
    "dynamic bias" rule, ``conv.py:54-143``)."""

    out_channels: int
    kernel_size: Kernel = 3
    strides: Kernel = 1
    dim: int = 3
    norm: Optional[str] = "instance"  # "instance" | "group" | None
    act: Optional[str] = "relu"
    norm_channels_per_group: int = 16
    norm_affine: bool = True
    transposed: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = _to_tuple(self.kernel_size, self.dim)
        s = _to_tuple(self.strides, self.dim)
        use_bias = self.norm is None
        conv_cls = nn.ConvTranspose if self.transposed else nn.Conv
        x = conv_cls(
            features=self.out_channels,
            kernel_size=k,
            strides=s,
            padding="SAME" if not self.transposed else "SAME",
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        if self.norm == "instance":
            x = InstanceNorm(
                use_scale=self.norm_affine, use_bias=self.norm_affine, dtype=self.dtype
            )(x)
        elif self.norm == "group":
            x = GroupNorm(
                channels_per_group=self.norm_channels_per_group,
                use_scale=self.norm_affine,
                use_bias=self.norm_affine,
                dtype=self.dtype,
            )(x)
        elif self.norm is not None:
            raise ValueError(f"unknown norm {self.norm}")
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=0.01)
        elif self.act is not None:
            raise ValueError(f"unknown act {self.act}")
        return x
