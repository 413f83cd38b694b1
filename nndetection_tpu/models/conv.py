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

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from nndetection_tpu.parallel.spatial import (
    get_spatial_axis,
    spatial_conv,
    spatial_group_norm,
    spatial_instance_norm,
    spatial_transposed_conv,
)

Kernel = Union[int, Sequence[int]]


def _to_tuple(k: Kernel, dim: int) -> Tuple[int, ...]:
    if isinstance(k, int):
        return (k,) * dim
    return tuple(int(v) for v in k)


class SpatialConvModule(nn.Module):
    """Halo-exchange conv, parameter-compatible with ``nn.Conv`` (same
    ``kernel``/``bias`` names, same ``[*k, C_in, C_out]`` layout and inits) so
    checkpoints move freely between sharded and unsharded execution. Used by
    the conv factory when a :func:`spatial_partitioning` context is active."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.he_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.bfloat16
    axis_name: str = "model"
    transposed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = tuple(self.kernel_size)
        # both nn.Conv and nn.ConvTranspose use the [*k, C_in, C_out] layout
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        fn = spatial_transposed_conv if self.transposed else spatial_conv
        return fn(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias=bias.astype(self.dtype) if bias is not None else None,
            strides=self.strides,
            axis_name=self.axis_name,
        )


def conv_layer(
    features: int,
    kernel_size: Kernel,
    strides: Kernel = 1,
    dim: int = 3,
    use_bias: bool = True,
    kernel_init: Callable = nn.initializers.he_normal(),
    bias_init: Callable = nn.initializers.zeros,
    dtype: Any = jnp.bfloat16,
    transposed: bool = False,
    name: Optional[str] = None,
):
    """Conv factory: ``nn.Conv``/``nn.ConvTranspose`` normally; halo-exchange
    spatial equivalents when tracing inside :func:`spatial_partitioning`.
    Explicit flax default names keep the parameter tree identical."""
    k = _to_tuple(kernel_size, dim)
    s = _to_tuple(strides, dim)
    ax = get_spatial_axis()
    if ax is not None and dim == 3:
        return SpatialConvModule(
            features=features,
            kernel_size=k,
            strides=s,
            use_bias=use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=dtype,
            axis_name=ax,
            transposed=transposed,
            name=name,
        )
    cls = nn.ConvTranspose if transposed else nn.Conv
    return cls(
        features=features,
        kernel_size=k,
        strides=s,
        padding="SAME",
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _shifted_stats(x: jnp.ndarray, axes: Tuple[int, ...]):
    """One-pass instance-norm statistics via a shifted second moment.

    The two-pass centered formula reads the activation twice (mean pass +
    variance pass) — measured at ~0.18 s/step of bandwidth-bound
    convert/multiply reduce fusions in the no-remat train-step profile. The
    raw one-pass E[x^2]-E[x]^2 cancels catastrophically for high-mean /
    low-variance activations (a real rsqrt blow-up, see the class docstring
    below). This takes the standard middle road: shift by a cheap
    stop-gradient estimate of the mean from a 1/64 strided subsample, then
    accumulate sum(t) and sum(t^2) of t = x - s together — XLA multi-output
    fusion computes both reductions in ONE read of x. With |E[t]| ~
    sigma/sqrt(n_sub), the cancellation term E[t]^2 is ~1/n_sub of E[t^2]:
    numerically benign. Gradients are exact because s is stopped
    (mean = s + E[t] has d/dx = 1/N independent of s).
    """
    sub = x[
        tuple(
            slice(None, None, max(1, x.shape[a] // 16)) if a in axes else slice(None)
            for a in range(x.ndim)
        )
    ]
    s = jax.lax.stop_gradient(
        jnp.mean(sub, axis=axes, keepdims=True, dtype=jnp.float32)
    )
    t = x.astype(jnp.float32) - s
    m1 = jnp.mean(t, axis=axes, keepdims=True)
    m2 = jnp.mean(t * t, axis=axes, keepdims=True)
    mean = s + m1
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return mean, var


def _head_shifted_stats(x: jnp.ndarray, axes: Tuple[int, ...]):
    """One-pass statistics shifted by a CONTIGUOUS head-block mean.

    Round-4 chip profiling showed :func:`_shifted_stats` (the strided
    1/16-per-axis subsample) measures SLOWER than two-pass (15.70 vs 15.97
    patches/s): a strided gather touches most HBM bursts despite reading few
    elements, so the "cheap" shift pass costs nearly a full read. This
    variant takes the shift from the leading ``1/64`` contiguous chunk of the
    flattened spatial axis instead — coalesced, ~1.6% extra read — then
    accumulates sum(t) / sum(t^2) of t = x - s in one fused pass (XLA
    multi-output fusion: both reductions share the single read of x).

    Numerics: |E[t]| <= |head mean - true mean| ~ sigma * sqrt(64/N), so the
    cancellation term E[t]^2 is O(64/N) of E[t^2] — benign for the >=2^15
    spatial sizes where this path matters (selected only when N >= 4096).
    Gradients are exact because s is stop_gradient'ed. Enabled with
    ``NNDET_IN_STATS=one_pass_head``.
    """
    lead = axes[0]
    n = 1
    for a in axes:
        n *= x.shape[a]
    if n < 4096:  # cancellation guard too weak; two-pass is cheap here anyway
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        diff = x - mean.astype(x.dtype)
        var = jnp.mean(
            jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
        )
        return mean, var
    head = max(1, x.shape[lead] // 64)
    sub = x[tuple(slice(None, head) if a == lead else slice(None) for a in range(x.ndim))]
    s = jax.lax.stop_gradient(
        jnp.mean(sub, axis=axes, keepdims=True, dtype=jnp.float32)
    )
    t = x.astype(jnp.float32) - s
    m1 = jnp.mean(t, axis=axes, keepdims=True)
    m2 = jnp.mean(t * t, axis=axes, keepdims=True)
    mean = s + m1
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return mean, var


def _plane_subsampled_stats(x: jnp.ndarray, axes: Tuple[int, ...], stride: int):
    """Two-pass statistics over a plane-stratified subsample.

    The HBM wall is the IN statistics passes re-reading every full-resolution
    activation (~36% of the round-4 device trace). Round 4 proved the
    strided-GATHER shortcut loses (``_shifted_stats``: a 1/16-per-axis
    subsample still touches most HBM bursts). This estimator reads every
    ``stride``-th DEPTH PLANE in full — whole [H, W, C] slabs, perfectly
    contiguous bursts — so the two stats passes cost 2/stride reads instead
    of 2. Depth-stratified sampling keeps the estimate unbiased across the
    axis activation statistics actually vary along; per-(b,c) sample counts
    at the stages that matter (>=2^17 voxels) leave relative stat noise
    ~O(1e-2) — the normalize scale is insensitive at that level, and norm
    layers tolerate (batchnorm exploits) far larger stat noise.

    Semantics: an APPROXIMATION of exact IN (reference computes exact stats,
    ``/root/reference/nndet/arch/conv.py:146``) — opt-in via
    ``NNDET_IN_STATS=plane_sub[:stride]``, accuracy-gated by the toy-accept
    A/B before ever becoming a default.
    """
    d_axis = axes[0]
    if x.shape[d_axis] < 2 * stride:
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        diff = x - mean.astype(x.dtype)
        var = jnp.mean(
            jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
        )
        return mean, var
    # centered stratification (start at stride//2): symmetric coverage of
    # depth trends, halving the ramp bias of an edge-anchored sample
    sub = x[
        tuple(
            slice(stride // 2, None, stride) if a == d_axis else slice(None)
            for a in range(x.ndim)
        )
    ]
    mean = jnp.mean(sub, axis=axes, keepdims=True, dtype=jnp.float32)
    diff = sub - mean.astype(sub.dtype)
    var = jnp.mean(
        jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
    )
    return mean, var


class InstanceNorm(nn.Module):
    """Instance normalization over spatial axes (per sample, per channel).

    Stats are computed in float32 regardless of input dtype. Two stats
    schedules are provided: the default two-pass centered formula and a
    one-pass shifted formula (``NNDET_IN_STATS=one_pass``) that saves one
    full HBM read of the activation per norm (see :func:`_shifted_stats`).
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    ) -> jnp.ndarray:
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        if stats is not None:
            # statistics precomputed by the producing conv's fused epilogue
            # (ops/pallas_conv.py) — skip every stats pass over x
            mean, var = stats
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            mean = mean.reshape(shape)
            inv = jax.lax.rsqrt(var.reshape(shape) + self.epsilon)
            scale = inv
            if self.use_scale:
                gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
                scale = inv * gamma
            shift = -mean * scale
            if self.use_bias:
                beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
                shift = shift + beta
            return (
                x * scale.astype(self.dtype) + shift.astype(self.dtype)
            ).astype(self.dtype)
        # statistics accumulate in float32 WITHOUT materializing an f32 copy
        # of the activation (a full-resolution f32 cast of stage-0 maps costs
        # GBs of HBM once residuals are kept for backward). The variance uses
        # the CENTERED formula — E[x^2]-E[x]^2 cancels catastrophically for
        # high-mean/low-variance activations and produced rsqrt blow-ups —
        # with the subtraction fused in the compute dtype and the square
        # accumulated in f32.
        ax = get_spatial_axis()
        if ax is not None:
            # spatially-partitioned volume: statistics must span the GLOBAL
            # volume — combine per-shard f32 sums with one psum pair
            gamma = (
                self.param("scale", nn.initializers.ones, (c,), jnp.float32)
                if self.use_scale
                else None
            )
            beta = (
                self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
                if self.use_bias
                else None
            )
            return spatial_instance_norm(
                x, scale=gamma, bias=beta, epsilon=self.epsilon, axis_name=ax
            ).astype(self.dtype)
        if os.environ.get("NNDET_IN_IMPL") == "pallas":
            # fused Pallas forward+backward (ops/pallas_norm.py): single-pass
            # Welford/Chan statistics — 2R+1W per map vs XLA's 3R+1W, and a
            # 4R+1W custom backward. Params are applied inside the kernel.
            from nndetection_tpu.ops.pallas_norm import fused_instance_norm

            gamma = (
                self.param("scale", nn.initializers.ones, (c,), jnp.float32)
                if self.use_scale
                else jnp.ones((c,), jnp.float32)
            )
            beta = (
                self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
                if self.use_bias
                else jnp.zeros((c,), jnp.float32)
            )
            return fused_instance_norm(x, gamma, beta, self.epsilon).astype(
                self.dtype
            )
        # Default schedule: plane-stratified stats (stride 8) for 3D volumes,
        # exact two-pass otherwise. plane_sub:8 cuts the stats passes' HBM
        # re-reads by 8x (chip A/B: 16.76 vs 15.88 patches/s = 2.095x the
        # reference baseline, artifacts/bench_train_r05_plane8.json) and is
        # accuracy-gated: the toy-accept run trained from scratch with it
        # reaches the identical all-1.0 AP/FROC table
        # (artifacts/toy_accept_plane8.json vs toy_accept_train24.json).
        # Opt out with NNDET_IN_STATS=two_pass for bit-exact reference stats.
        default_impl = "plane_sub:8" if x.ndim == 5 else "two_pass"
        stats_impl = os.environ.get("NNDET_IN_STATS", default_impl)
        if stats_impl == "one_pass":
            mean, var = _shifted_stats(x, axes)
        elif stats_impl == "one_pass_head":
            mean, var = _head_shifted_stats(x, axes)
        elif stats_impl.startswith("plane_sub"):
            stride = int(stats_impl.split(":")[1]) if ":" in stats_impl else 4
            mean, var = _plane_subsampled_stats(x, axes, stride)
        else:
            mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
            diff = x - mean.astype(x.dtype)
            var = jnp.mean(
                jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
            )
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
        ax = get_spatial_axis()
        if ax is not None:
            # parameter-compatible child (same "GroupNorm_0" path and
            # scale/bias names as flax's nn.GroupNorm) with global statistics
            y = _SpatialGroupNorm(
                num_groups=groups,
                epsilon=self.epsilon,
                use_scale=self.use_scale,
                use_bias=self.use_bias,
                axis_name=ax,
                name="GroupNorm_0",
            )(x)
            return y.astype(self.dtype)
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return y.astype(self.dtype)


class _SpatialGroupNorm(nn.Module):
    num_groups: int
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: str = "model"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = (
            self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            if self.use_scale
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            if self.use_bias
            else None
        )
        return spatial_group_norm(
            x,
            self.num_groups,
            scale=scale,
            bias=bias,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
        )


class _ConvKernelParam(nn.Module):
    """Bare conv-kernel parameter holder, tree-identical to ``nn.Conv`` with
    ``use_bias=False`` (param path ``Conv_0/kernel``, layout [*k, Ci, Co]) so
    checkpoints move freely between the fused-Pallas and XLA conv paths."""

    features: int
    kernel_size: Tuple[int, ...]
    kernel_init: Callable = nn.initializers.he_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )


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
        stats = None
        if (
            os.environ.get("NNDET_CONV_FUSED") == "1"
            and self.norm == "instance"
            and not self.transposed
            and get_spatial_axis() is None
        ):
            from nndetection_tpu.ops.pallas_conv import conv3d_in_stats, supported

            if supported(x.shape, k, s, self.dim):
                # fused Pallas conv: IN statistics accumulated in the conv's
                # VMEM epilogue — the two stats passes over the output never
                # touch HBM. Parameter tree identical to the nn.Conv path.
                kernel = _ConvKernelParam(
                    features=self.out_channels, kernel_size=k, name="Conv_0"
                )(x)
                x, mean, var = conv3d_in_stats(x.astype(self.dtype), kernel)
                stats = (mean, var)
        if stats is None:
            x = conv_layer(
                features=self.out_channels,
                kernel_size=k,
                strides=s,
                dim=self.dim,
                use_bias=use_bias,
                dtype=self.dtype,
                transposed=self.transposed,
                # flax's auto-names, so sharded/unsharded param trees match
                name="ConvTranspose_0" if self.transposed else "Conv_0",
            )(x)
        if self.norm == "instance":
            x = InstanceNorm(
                use_scale=self.norm_affine, use_bias=self.norm_affine, dtype=self.dtype
            )(x, stats=stats)
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
