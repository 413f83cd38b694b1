"""Fused instance-norm Pallas kernels (TPU).

Why: the train-step profile is dominated by elementwise/reduce fusions over
the full-resolution feature maps, not convolutions; the instance-norm stats
(`convert_reduce` fusions, bf16->f32 mean/variance) alone are ~20% of the
step (round-4 trace of the LUNA-plan step). XLA's two-pass formulation costs
3 reads + 1 write of every normalized map in the forward (mean pass,
variance pass, normalize pass); its autodiff costs more in the backward.

These kernels bring the forward to the information-theoretic floor for
exact statistics — 2 reads + 1 write — by computing mean AND variance in a
single pass with Welford/Chan block combining (numerically robust: each
VMEM block is centered on its own mean before squaring, so the catastrophic
E[x^2]-E[x]^2 cancellation that sank the naive one-pass variant
(commit 68b72b3, measured slower AND less accurate) never appears), and the
backward to 4 reads + 1 write (one pass accumulating the two per-(b,c)
gradient sums, one pass emitting dx).

Replaces (functionally) the per-instance-norm portion of the reference's
AMP'd torch InstanceNorm (``/root/reference/nndet/arch/conv.py:146``);
selected via ``NNDET_IN_IMPL=pallas`` (see ``models/conv.py``).

Status (round-4 chip measurement): OPT-IN, not default. Isolated kernel wins
(micro A/B: fused fwd+bwd faster than XLA's two-pass at [8,48,64,64,32]
bf16), but inside the full train step ``pallas_call`` pins its operands to
the default row-major layout, so XLA inserts layout-conversion copies of
every normalized map; at the high-resolution stages C is 32-64 < the 128
lane width, the copies tile-pad 2-4x, and the step OOMs 16 GB HBM at the
LUNA plan size. A net win needs a layout-aware kernel (C on sublanes, fused
spatial on lanes) or C >= 128 — tracked in docs/roadmap.md.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target VMEM block footprint for the spatial chunk (bytes of f32 workspace);
# blocks are (1, CHUNK, C) — small enough to double-buffer comfortably
_TARGET_BLOCK_ELEMS = 128 * 1024


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are testable on CPU (same
    convention as ops/pallas_ops.py)."""
    return jax.default_backend() != "tpu"


def _pick_chunk(s: int, c: int) -> int:
    """Largest divisor of ``s`` that is a multiple of 16 (bf16 sublane tile)
    and keeps the (CHUNK, C) block near the VMEM target. 0 = no clean chunk
    (caller falls back to the XLA path)."""
    target = max(16, _TARGET_BLOCK_ELEMS // max(c, 1))
    best = 0
    # spatial sizes here are products of small strides (powers of 2 x {3, 5});
    # scan multiples of 16 up to the target for divisors
    for chunk in range(16, min(s, target) + 1, 16):
        if s % chunk == 0:
            best = chunk
    if best == 0 and s % 8 == 0 and s >= 8:
        for chunk in range(8, min(s, target) + 1, 8):
            if s % chunk == 0:
                best = chunk
    return best


def _stats_kernel(x_ref, mean_ref, m2_ref):
    """Single-pass per-(b, c) statistics, Chan parallel combine over chunks.

    Grid (B, K), K fastest: for each batch row the chunk index sweeps
    sequentially, accumulating running mean / M2 in the output refs.

    Stat refs are blocked (1, 1, C) over (B, 1, C) arrays — the singleton
    axis keeps the block's last-two dims equal to the array's, which is what
    Mosaic's (8, 128) tiling rule requires for C < 128.
    """
    k = pl.program_id(1)
    chunk = x_ref.shape[1]
    x = x_ref[0].astype(jnp.float32)  # [CHUNK, C]
    m_k = jnp.mean(x, axis=0, keepdims=True)  # [1, C]
    d = x - m_k
    m2_k = jnp.sum(d * d, axis=0, keepdims=True)  # [1, C]

    @pl.when(k == 0)
    def _():
        mean_ref[0] = m_k
        m2_ref[0] = m2_k

    @pl.when(k > 0)
    def _():
        n_acc = (k * chunk).astype(jnp.float32)
        n_new = n_acc + chunk
        delta = m_k - mean_ref[0]
        mean_ref[0] = mean_ref[0] + delta * (chunk / n_new)
        m2_ref[0] = (
            m2_ref[0] + m2_k + delta * delta * (n_acc * chunk / n_new)
        )


def _apply_kernel(x_ref, mean_ref, scale_ref, beta_ref, y_ref):
    """y = (x - mean[b]) * scale[b] + beta — subtract-then-scale: the folded
    ``x*scale + (beta - mean*scale)`` form cancels catastrophically when
    |mean| >> sigma (both terms ~|mean·scale|), this form never does."""
    x = x_ref[0].astype(jnp.float32)
    y_ref[0] = ((x - mean_ref[0]) * scale_ref[0] + beta_ref[0]).astype(
        y_ref.dtype
    )


def _grad_stats_kernel(x_ref, dy_ref, mean_ref, inv_ref, s1_ref, s2_ref):
    """Accumulate s1 = sum(dy), s2 = sum(dy * xhat) per (b, c)."""
    k = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (x - mean_ref[0]) * inv_ref[0]
    p1 = jnp.sum(dy, axis=0, keepdims=True)
    p2 = jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when(k == 0)
    def _():
        s1_ref[0] = p1
        s2_ref[0] = p2

    @pl.when(k > 0)
    def _():
        s1_ref[0] = s1_ref[0] + p1
        s2_ref[0] = s2_ref[0] + p2


def _dx_kernel(x_ref, dy_ref, mean_ref, ginv_ref, inv_ref, a_ref, b_ref, dx_ref):
    """dx = gamma*inv * (dy - a/S - xhat * b/S)  (a, b pre-divided by S)."""
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (x - mean_ref[0]) * inv_ref[0]
    dx = ginv_ref[0] * (dy - a_ref[0] - xhat * b_ref[0])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _stat_spec(c):
    """Block spec for a per-(b, c) statistics array stored as (B, 1, C)."""
    return pl.BlockSpec((1, 1, c), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM)


def _stats(x3: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bsz, s, c = x3.shape
    grid = (bsz, s // chunk)
    mean, m2 = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[_stat_spec(c), _stat_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3)
    return mean.reshape(bsz, c), m2.reshape(bsz, c) / s


def _apply(x3, mean, scale, beta, chunk):
    bsz, s, c = x3.shape
    return pl.pallas_call(
        _apply_kernel,
        grid=(bsz, s // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
            ),
            _stat_spec(c),
            _stat_spec(c),
            _stat_spec(c),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=_interpret(),
    )(x3, mean.reshape(bsz, 1, c), scale.reshape(bsz, 1, c),
      beta.reshape(bsz, 1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_instance_norm(x, gamma, beta, eps: float = 1e-5):
    """Instance norm over all spatial axes, channel-last, any rank:
    ``x [B, *spatial, C]``, ``gamma/beta [C]`` f32 (may be None -> ones/zeros
    handled by the caller). Output in ``x.dtype``."""
    y, _ = _fused_in_fwd(x, gamma, beta, eps)
    return y


def _fused_in_fwd(x, gamma, beta, eps):
    shape = x.shape
    bsz, c = shape[0], shape[-1]
    s = int(np.prod(shape[1:-1]))
    chunk = _pick_chunk(s, c)
    if chunk == 0:  # no clean chunking: XLA two-pass fallback
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jax.lax.square(x - mean.astype(x.dtype)), axis=axes,
            keepdims=True, dtype=jnp.float32,
        )
        inv = jax.lax.rsqrt(var + eps)
        scale = inv * gamma
        shift = beta - mean * scale
        y = (x * scale.astype(x.dtype) + shift.astype(x.dtype)).astype(x.dtype)
        return y, (x, gamma, mean.reshape(bsz, c), inv.reshape(bsz, c))
    x3 = x.reshape(bsz, s, c)
    mean, var = _stats(x3, chunk)  # [B, C] f32
    inv = jax.lax.rsqrt(var + eps)
    scale = inv * gamma[None]  # [B, C]
    beta_b = jnp.broadcast_to(beta[None], (bsz, c))
    y = _apply(x3, mean, scale, beta_b, chunk).reshape(shape)
    return y, (x, gamma, mean, inv)


def _fused_in_bwd(eps, residuals, dy):
    x, gamma, mean, inv = residuals
    shape = x.shape
    bsz, c = shape[0], shape[-1]
    s = int(np.prod(shape[1:-1]))
    chunk = _pick_chunk(s, c)  # static, same decision as the forward
    if chunk == 0:  # XLA fallback backward
        axes = tuple(range(1, x.ndim - 1))
        mean_full = mean.reshape((bsz,) + (1,) * (x.ndim - 2) + (c,))
        inv_full = inv.reshape((bsz,) + (1,) * (x.ndim - 2) + (c,))
        xhat = (x.astype(jnp.float32) - mean_full) * inv_full
        dyf = dy.astype(jnp.float32)
        s1 = jnp.mean(dyf, axis=axes, keepdims=True)
        s2 = jnp.mean(dyf * xhat, axis=axes, keepdims=True)
        dgamma = jnp.sum(dyf * xhat, axis=(0,) + axes)
        dbeta = jnp.sum(dyf, axis=(0,) + axes)
        dx = (gamma * inv_full) * (dyf - s1 - xhat * s2)
        return dx.astype(x.dtype), dgamma, dbeta
    x3 = x.reshape(bsz, s, c)
    dy3 = dy.reshape(bsz, s, c)
    mean3 = mean.reshape(bsz, 1, c)
    inv3 = inv.reshape(bsz, 1, c)
    s1, s2 = pl.pallas_call(
        _grad_stats_kernel,
        grid=(bsz, s // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
            _stat_spec(c),
            _stat_spec(c),
        ],
        out_specs=[_stat_spec(c), _stat_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, dy3, mean3, inv3)
    dgamma = jnp.sum(s2, axis=(0, 1))
    dbeta = jnp.sum(s1, axis=(0, 1))
    ginv = gamma[None, None] * inv3  # [B, 1, C]
    dx = pl.pallas_call(
        _dx_kernel,
        grid=(bsz, s // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
            _stat_spec(c),
            _stat_spec(c),
            _stat_spec(c),
            _stat_spec(c),
            _stat_spec(c),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, c), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=_interpret(),
    )(x3, dy3, mean3, ginv, inv3, s1 / s, s2 / s)
    return dx.reshape(shape), dgamma, dbeta


fused_instance_norm.defvjp(_fused_in_fwd, _fused_in_bwd)
