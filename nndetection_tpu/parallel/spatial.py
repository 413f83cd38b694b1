"""Spatial partitioning of 3D volumes over the ``model`` mesh axis.

For patches too large for one chip's HBM, the volume is sharded along one
spatial axis across the ``model`` axis of the device mesh and convolutions
become *halo-exchange* convolutions: each shard trades its boundary slabs
with mesh neighbours over ICI (``lax.ppermute``), then runs a purely local
VALID convolution whose result equals its slice of the global SAME
convolution.  This is the TPU-native counterpart of what the reference
simply cannot do — its patch size is hard-capped by single-GPU memory
(SURVEY.md §2.11: no model parallelism anywhere in the reference).

Key property used throughout: ``ppermute`` leaves destinations that no
source maps to as ZEROS, which is exactly SAME convolution's zero padding at
the global volume edges — edge shards need no special casing.

All functions are written to run inside ``jax.shard_map`` with a named mesh
axis (default ``"model"``); see ``tests/test_spatial.py`` for the
equivalence proofs against unsharded convolutions on a CPU mesh.
"""
from __future__ import annotations

from contextlib import contextmanager
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _axis_size(axis_name: str) -> int:
    return lax.axis_size(axis_name)


# ---------------------------------------------------------------------------
# spatial-partitioning context: which mesh axis (if any) the volume's leading
# spatial dimension is sharded over. The model modules consult this at trace
# time, so the SAME flax module tree (same parameter names, checkpoint
# compatible) traces to halo-exchange collectives when tracing happens inside
# the context — e.g. from the trainer's shard_map body.
# ---------------------------------------------------------------------------
_SPATIAL_AXIS: Optional[str] = None


def get_spatial_axis() -> Optional[str]:
    return _SPATIAL_AXIS


@contextmanager
def spatial_partitioning(axis_name: str = "model"):
    """While active, model tracing emits spatially-partitioned ops (halo
    convs, psum norms, per-level all-gathers) over ``axis_name``."""
    global _SPATIAL_AXIS
    prev = _SPATIAL_AXIS
    _SPATIAL_AXIS = axis_name
    try:
        yield
    finally:
        _SPATIAL_AXIS = prev


def halo_exchange(
    x: jnp.ndarray,
    halo_lo: int,
    halo_hi: int,
    axis_name: str = "model",
    spatial_axis: int = 1,
) -> jnp.ndarray:
    """Pad a sharded spatial axis with neighbour slabs.

    ``x`` is the local shard ``[..., n_local, ...]``; returns
    ``[..., halo_lo + n_local + halo_hi, ...]`` where the halos come from the
    previous/next shard along ``axis_name`` (zeros at the global edges,
    matching SAME-padding semantics).
    """
    n_dev = _axis_size(axis_name)
    parts = []
    if halo_lo > 0:
        # my low halo = the previous shard's top slab; shift "upward": i -> i+1
        slab = lax.slice_in_dim(
            x, x.shape[spatial_axis] - halo_lo, x.shape[spatial_axis],
            axis=spatial_axis,
        )
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        parts.append(lax.ppermute(slab, axis_name, perm))
    parts.append(x)
    if halo_hi > 0:
        slab = lax.slice_in_dim(x, 0, halo_hi, axis=spatial_axis)
        perm = [(i + 1, i) for i in range(n_dev - 1)]
        parts.append(lax.ppermute(slab, axis_name, perm))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=spatial_axis)


def _same_halos(n_global: int, k: int, s: int) -> Tuple[int, int]:
    """(halo_lo, halo_hi) so a local VALID conv over the padded shard equals
    the shard's slice of the global SAME conv.  Requires the shard length to
    be divisible by the stride."""
    out = -(-n_global // s)  # ceil
    pad_total = max((out - 1) * s + k - n_global, 0)
    pad_lo = pad_total // 2
    # local output j' reads input [j'*s - pad_lo, j'*s - pad_lo + k)
    return pad_lo, max(k - s - pad_lo, 0)


def spatial_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (1, 1, 1),
    axis_name: str = "model",
    spatial_axis: int = 1,
) -> jnp.ndarray:
    """SAME-padding ND convolution on a volume sharded along one spatial
    axis.

    ``x``: local shard, channel-last ``[N, *spatial_local, C]``; ``kernel``:
    ``[*k, C_in, C_out]`` (flax layout).  The sharded axis uses a halo
    exchange + VALID window; unsharded axes use ordinary SAME padding.  The
    local shard length along the sharded axis must be divisible by its
    stride.
    """
    dim = x.ndim - 2
    sp = spatial_axis - 1  # index into the spatial dims
    strides = tuple(int(s) for s in strides)
    k_sharded = kernel.shape[sp]
    n_dev = _axis_size(axis_name)
    n_local = x.shape[spatial_axis]
    if n_local % strides[sp] != 0:
        raise ValueError(
            f"sharded-axis shard length {n_local} not divisible by stride "
            f"{strides[sp]}"
        )
    halo_lo, halo_hi = _same_halos(n_local * n_dev, k_sharded, strides[sp])
    if max(halo_lo, halo_hi) > n_local:
        raise ValueError(
            f"halo {max(halo_lo, halo_hi)} exceeds shard length {n_local}; "
            "use fewer shards or a larger volume"
        )
    x = halo_exchange(x, halo_lo, halo_hi, axis_name, spatial_axis)

    padding = []
    for d in range(dim):
        if d == sp:
            padding.append((0, 0))  # halos already applied
        else:
            out = -(-x.shape[1 + d] // strides[d])
            pad_total = max(
                (out - 1) * strides[d] + kernel.shape[d] - x.shape[1 + d], 0
            )
            padding.append((pad_total // 2, pad_total - pad_total // 2))

    dn = lax.conv_dimension_numbers(
        x.shape,
        kernel.shape,
        ("NDHWC", "DHWIO", "NDHWC") if dim == 3 else ("NHWC", "HWIO", "NHWC"),
    )
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def spatial_transposed_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (2, 2, 2),
    axis_name: str = "model",
    spatial_axis: int = 1,
) -> jnp.ndarray:
    """Stride-s transposed convolution (decoder upsampling) on a sharded
    volume for the ``kernel == stride`` case the framework's U-FPN uses:
    every output voxel depends on exactly one input voxel, so the op is
    purely local — no halo traffic at all.
    """
    dim = x.ndim - 2
    if tuple(kernel.shape[:dim]) != tuple(strides):
        raise NotImplementedError(
            "sharded transposed conv supports kernel == stride (the U-FPN "
            f"upsampler); got kernel {kernel.shape[:dim]} stride {strides}"
        )
    dn = lax.conv_dimension_numbers(
        x.shape,
        kernel.shape,
        ("NDHWC", "DHWIO", "NDHWC") if dim == 3 else ("NHWC", "HWIO", "NHWC"),
    )
    y = lax.conv_transpose(
        x,
        kernel.astype(x.dtype),
        strides=tuple(strides),
        padding="VALID",
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def spatial_instance_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    epsilon: float = 1e-5,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Instance norm whose statistics span the GLOBAL (unsharded) volume:
    per-shard f32 sums are combined with one ``psum`` pair, then the same
    centered-variance formula as :class:`nndetection_tpu.models.conv
    .InstanceNorm` is applied locally."""
    axes = tuple(range(1, x.ndim - 1))
    n_local = 1
    for a in axes:
        n_local *= x.shape[a]
    n_global = n_local * _axis_size(axis_name)
    s1 = jnp.sum(x, axis=axes, keepdims=True, dtype=jnp.float32)
    mean = lax.psum(s1, axis_name) / n_global
    diff = x - mean.astype(x.dtype)
    s2 = jnp.sum(
        jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
    )
    var = lax.psum(s2, axis_name) / n_global
    inv = jax.lax.rsqrt(var + epsilon)
    out_scale = inv if scale is None else inv * scale
    shift = -mean * out_scale
    if bias is not None:
        shift = shift + bias
    return (x * out_scale.astype(x.dtype) + shift.astype(x.dtype)).astype(x.dtype)


def spatial_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    epsilon: float = 1e-5,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Group norm whose statistics span the GLOBAL volume (the heads'
    GroupNorm under spatial partitioning): per-shard f32 sums over
    (spatial, channels-in-group) are combined with one ``psum`` pair."""
    c = x.shape[-1]
    group_c = c // num_groups
    orig_shape = x.shape
    xg = x.reshape(*x.shape[:-1], num_groups, group_c)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)  # spatial + in-group
    n_local = group_c
    for a in range(1, xg.ndim - 2):
        n_local *= xg.shape[a]
    n_global = n_local * _axis_size(axis_name)
    s1 = jnp.sum(xg, axis=axes, keepdims=True, dtype=jnp.float32)
    mean = lax.psum(s1, axis_name) / n_global
    diff = xg - mean.astype(xg.dtype)
    s2 = jnp.sum(
        jax.lax.square(diff), axis=axes, keepdims=True, dtype=jnp.float32
    )
    var = lax.psum(s2, axis_name) / n_global
    inv = jax.lax.rsqrt(var + epsilon)
    y = (diff * inv.astype(xg.dtype)).reshape(orig_shape)
    if scale is not None:
        y = y * scale.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def spatial_max_pool(
    x: jnp.ndarray,
    window: Sequence[int],
    strides: Optional[Sequence[int]] = None,
    axis_name: str = "model",
    spatial_axis: int = 1,
) -> jnp.ndarray:
    """SAME max pooling on a sharded volume (halo exchange on the sharded
    axis, local reduce-window elsewhere)."""
    dim = x.ndim - 2
    window = tuple(int(w) for w in window)
    strides = tuple(int(s) for s in (strides or window))
    sp = spatial_axis - 1
    n_dev = _axis_size(axis_name)
    n_local = x.shape[spatial_axis]
    if n_local % strides[sp] != 0:
        raise ValueError("shard length must divide the pooling stride")
    halo_lo, halo_hi = _same_halos(n_local * n_dev, window[sp], strides[sp])
    neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
    if halo_lo or halo_hi:
        # halo_exchange zero-fills at edges; for max pooling the fill must be
        # -inf, so shift into positives is avoided by masking afterwards:
        # exchange an explicit validity mask alongside the data.
        ones = jnp.ones_like(x)
        x = halo_exchange(x, halo_lo, halo_hi, axis_name, spatial_axis)
        valid = halo_exchange(ones, halo_lo, halo_hi, axis_name, spatial_axis)
        x = jnp.where(valid > 0, x, neg)
    padding = []
    for d in range(dim):
        if d == sp:
            padding.append((0, 0))
        else:
            out = -(-x.shape[1 + d] // strides[d])
            pad_total = max(
                (out - 1) * strides[d] + window[d] - x.shape[1 + d], 0
            )
            padding.append((pad_total // 2, pad_total - pad_total // 2))
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding=((0, 0), *padding, (0, 0)),
    )


def gather_spatial(
    x: jnp.ndarray, axis_name: str = "model", spatial_axis: int = 1
) -> jnp.ndarray:
    """All-gather shards back into the full volume (e.g. before the
    detection heads' flatten, or for host transfer)."""
    return lax.all_gather(x, axis_name, axis=spatial_axis, tiled=True)
