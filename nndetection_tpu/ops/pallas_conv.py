"""Fused 3D convolution with instance-norm statistics epilogue (Pallas TPU).

THE structural HBM lever the round-4 verdict asked for: the train-step
profile is bound by the IN statistics passes re-reading every conv output
(bf16->f32 ``convert_reduce`` ~20% + ``multiply_reduce`` ~16% of device
time). XLA cannot fuse a reduction into a TPU convolution's output, so the
exact stats cost two extra full reads of every normalized activation. This
kernel computes the conv AND accumulates the per-(batch, channel) first/
second moments while the output tiles are still in VMEM — statistics for
free: 1 read (input) + 1 write (output) per layer instead of 1R+1W+2R.

Scope: 3x3x3, stride 1, SAME, NDHWC — the layout/shape of every intra-block
conv in the published architecture (``models/blocks.py::StackedConvBlock``;
reference block: ``/root/reference/nndet/arch/blocks/basic.py:37-180``).
Strided/1x1/transposed convs stay on XLA (they sit at reduced resolution
where the stats traffic is 4-64x smaller per stage).

Numerics: accumulation in f32 via dot_general ``preferred_element_type``;
output rounded to bf16 exactly like XLA's bf16 conv, and the statistics are
taken from the ROUNDED output so they match what the XLA path would compute
from the materialized tensor. The second moment is shifted by the
first-plane mean (same argument as ``models/conv.py::_head_shifted_stats``:
|E[t]|^2 is O(HW/N) of E[t^2] — benign for the >=2^15-voxel stages where
this kernel is selected).

Backward is XLA (``jax.vjp`` of ``lax.conv_general_dilated``) via
``custom_vjp``: gradients are exact — d mean/dy = 1/N and
d var/dy = 2(y-mean)/N regardless of the shift used for forward numerics.

Status: opt-in (``NNDET_CONV_FUSED=1``) pending the chip A/B; the round-4
Pallas-IN postmortem (ops/pallas_norm.py docstring) showed pallas_call
layout pinning can tax C<128 operands in context.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# VMEM budget for the main input block (bytes); the padded working copy,
# per-tap matmul operands and the f32 accumulator all scale with it
_BLOCK_BYTES = 2 * 1024 * 1024


def _pick_t(d: int, h: int, w: int, ci: int) -> int:
    """Largest divisor of ``d`` whose (T, H, W, Ci) bf16 block fits the
    budget; 0 when even T=1 does not fit."""
    plane = h * w * ci * 2
    best = 0
    for t in range(1, d + 1):
        if d % t:
            continue
        if t * plane <= _BLOCK_BYTES:
            best = t
    return best


def _kernel(x_ref, top_ref, bot_ref, w_ref, y_ref, mean_ref, var_ref,
            acc_ref, shift_ref, *, t_blk, co, n_total, eps_unused):
    i = pl.program_id(1)
    n_d = pl.num_programs(1)

    x = x_ref[0]            # [T, H, W, Ci] bf16
    _, h, w, ci = x.shape
    top = top_ref[0]        # [1, H, W, Ci] (clamped plane; zero at edge)
    bot = bot_ref[0]
    zero = jnp.zeros_like(top)
    top = jnp.where(i == 0, zero, top)
    bot = jnp.where(i == n_d - 1, zero, bot)
    xa = jnp.concatenate([top, x, bot], axis=0)          # [T+2, H, W, Ci]
    xp = jnp.pad(xa, ((0, 0), (1, 1), (1, 1), (0, 0)))    # [T+2, H+2, W+2, Ci]

    wk = w_ref[...]          # [3, 3, 3, Ci, Co] bf16
    # one output plane at a time: caps the live f32 accumulator at
    # [H*W, Co] (2.1 MB at the 128x128x32 stage) instead of T planes
    planes = []
    for tl in range(t_blk):
        acc = jnp.zeros((h * w, co), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = xp[tl + dz, dy:dy + h, dx:dx + w, :]
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(-1, ci),
                        wk[dz, dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        yp = acc.reshape(h, w, co).astype(jnp.bfloat16)
        y_ref[0, tl] = yp
        planes.append(yp)

    # ---- statistics epilogue (per batch item, across the D grid) --------
    @pl.when(i == 0)
    def _():
        shift_ref[...] = jnp.mean(planes[0].astype(jnp.float32), axis=(0, 1))
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = shift_ref[...]
    for yp in planes:
        tshift = yp.astype(jnp.float32) - s[None, None, :]
        acc_ref[0, :] += jnp.sum(tshift, axis=(0, 1))
        acc_ref[1, :] += jnp.sum(tshift * tshift, axis=(0, 1))

    @pl.when(i == n_d - 1)
    def _():
        m1 = acc_ref[0, :] / n_total
        m2 = acc_ref[1, :] / n_total
        mean_ref[0] = s + m1
        var_ref[0] = jnp.maximum(m2 - m1 * m1, 0.0)


def _conv3d_in_stats_fwd_impl(x: jnp.ndarray, w: jnp.ndarray):
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    t_blk = _pick_t(d, h, wd, ci)
    if t_blk == 0:
        raise ValueError(f"no valid depth block for shape {x.shape}")
    n_d = d // t_blk
    n_total = float(d * h * wd)

    kern = functools.partial(
        _kernel, t_blk=t_blk, co=co, n_total=n_total, eps_unused=0.0
    )
    y, mean, var = pl.pallas_call(
        kern,
        grid=(b, n_d),
        in_specs=[
            pl.BlockSpec((1, t_blk, h, wd, ci), lambda bb, ii: (bb, ii, 0, 0, 0)),
            # halo planes, index clamped at the volume edges (the kernel
            # zeroes them when the clamp fired)
            pl.BlockSpec(
                (1, 1, h, wd, ci),
                lambda bb, ii, _t=t_blk, _nd=n_d: (
                    bb, jnp.maximum(ii * _t - 1, 0), 0, 0, 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, h, wd, ci),
                lambda bb, ii, _t=t_blk, _nd=n_d: (
                    bb, jnp.minimum(ii * _t + _t, _nd * _t - 1), 0, 0, 0
                ),
            ),
            pl.BlockSpec((3, 3, 3, ci, co), lambda bb, ii: (0, 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t_blk, h, wd, co), lambda bb, ii: (bb, ii, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda bb, ii: (bb, 0)),
            pl.BlockSpec((1, co), lambda bb, ii: (bb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, wd, co), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, co), jnp.float32),
            jax.ShapeDtypeStruct((b, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, co), jnp.float32),
            pltpu.VMEM((co,), jnp.float32),
        ],
        interpret=_interpret(),
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
      w.astype(jnp.bfloat16))
    return y, mean, var


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_in_stats(x: jnp.ndarray, w: jnp.ndarray):
    """``y = conv3d(x, w)`` (bf16, SAME, stride 1) plus per-(b, c) instance
    mean/variance of ``y``, with the statistics accumulated in the conv's
    VMEM epilogue — no post-hoc reads of ``y``."""
    return _conv3d_in_stats_fwd_impl(x, w)


def _fwd(x, w):
    y, mean, var = _conv3d_in_stats_fwd_impl(x, w)
    return (y, mean, var), (x, w, y, mean)


def _bwd(res, cts):
    x, w, y, mean = res
    dy, dmean, dvar = cts
    b, d, h, wd, _ = y.shape
    n = float(d * h * wd)
    # exact gradients of the statistics outputs w.r.t. y
    dy_total = dy.astype(jnp.float32)
    if dmean is not None:
        dy_total = dy_total + (dmean / n)[:, None, None, None, :]
    if dvar is not None:
        dy_total = dy_total + (dvar * 2.0 / n)[:, None, None, None, :] * (
            y.astype(jnp.float32) - mean[:, None, None, None, :]
        )
    _, vjp = jax.vjp(_xla_conv, x, w)
    dx, dw = vjp(dy_total.astype(jnp.bfloat16))
    return dx, dw.astype(w.dtype)


conv3d_in_stats.defvjp(_fwd, _bwd)


def supported(x_shape, kernel_size, strides, dim) -> bool:
    """Trace-time applicability check for the fused path."""
    if dim != 3 or tuple(kernel_size) != (3, 3, 3):
        return False
    if tuple(strides) != (1, 1, 1):
        return False
    b, d, h, w, ci = x_shape
    return _pick_t(d, h, w, ci) > 0
