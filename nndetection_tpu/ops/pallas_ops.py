"""Pallas TPU kernels for box geometry hot paths.

The reference's device tier is a CUDA bitmask NMS
(``/root/reference/nndet/csrc/cuda/nms.cu:22-219``). On TPU the pairwise-IoU
matrix is the shared core of NMS, ATSS matching and WBC; this module provides
a blocked Pallas kernel computing it entirely in VMEM with component-major
layout (boxes stored as 8 rows [x1,y1,x2,y2,z1,z2,pad,pad] x N so the lane
dimension is the box axis, tiling cleanly to (8, 128)).

``iou_matrix_pallas`` is wired behind the same interface as
:func:`nndetection_tpu.core.boxes.ops.box_iou`; CPU tests run the kernel in
interpreter mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU for interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # noqa: BLE001
    pltpu = None
    _HAS_PLTPU = False

BLOCK_N = 256
BLOCK_M = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _iou_kernel(b1_ref, b2_ref, out_ref):
    """One (BLOCK_N, BLOCK_M) tile of the IoU matrix.

    b1_ref: [8, BLOCK_N] component-major boxes; b2_ref: [8, BLOCK_M].
    """
    b1 = b1_ref[...]  # [8, BN]
    b2 = b2_ref[...]  # [8, BM]

    def col(ref, i):
        return ref[i, :]

    # [BN, 1] vs [1, BM] broadcasting
    x1 = jnp.maximum(col(b1, 0)[:, None], col(b2, 0)[None, :])
    y1 = jnp.maximum(col(b1, 1)[:, None], col(b2, 1)[None, :])
    x2 = jnp.minimum(col(b1, 2)[:, None], col(b2, 2)[None, :])
    y2 = jnp.minimum(col(b1, 3)[:, None], col(b2, 3)[None, :])
    z1 = jnp.maximum(col(b1, 4)[:, None], col(b2, 4)[None, :])
    z2 = jnp.minimum(col(b1, 5)[:, None], col(b2, 5)[None, :])
    inter = (
        jnp.maximum(x2 - x1, 0.0)
        * jnp.maximum(y2 - y1, 0.0)
        * jnp.maximum(z2 - z1, 0.0)
    )
    vol1 = (
        (col(b1, 2) - col(b1, 0))
        * (col(b1, 3) - col(b1, 1))
        * (col(b1, 5) - col(b1, 4))
    )
    vol2 = (
        (col(b2, 2) - col(b2, 0))
        * (col(b2, 3) - col(b2, 1))
        * (col(b2, 5) - col(b2, 4))
    )
    union = vol1[:, None] + vol2[None, :] - inter
    out_ref[...] = inter / jnp.maximum(union, 1e-12)


@functools.partial(jax.jit, static_argnames=("interpret",))
def iou_matrix_pallas(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pairwise 3D IoU ``[N, M]`` via a blocked Pallas kernel.

    Args:
        boxes1: ``[N, 6]``; boxes2: ``[M, 6]`` (row-major, any float dtype)
        interpret: run in Pallas interpreter mode (CPU testing)
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    n_pad = _round_up(max(n, 8), BLOCK_N)
    m_pad = _round_up(max(m, 8), BLOCK_M)

    def prep(b, size):
        # component-major [8, size]: rows 0..5 = coords, rows 6..7 zero pad
        b = b.astype(jnp.float32)
        comp = jnp.zeros((8, size), jnp.float32)
        comp = comp.at[:6, : b.shape[0]].set(b.T)
        return comp

    b1 = prep(boxes1, n_pad)
    b2 = prep(boxes2, m_pad)

    grid = (n_pad // BLOCK_N, m_pad // BLOCK_M)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        vmem = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((8, BLOCK_N), lambda i, j: (0, i), memory_space=vmem),
            pl.BlockSpec((8, BLOCK_M), lambda i, j: (0, j), memory_space=vmem),
        ]
        out_spec = pl.BlockSpec(
            (BLOCK_N, BLOCK_M), lambda i, j: (i, j), memory_space=vmem
        )
    else:
        in_specs = [
            pl.BlockSpec((8, BLOCK_N), lambda i, j: (0, i)),
            pl.BlockSpec((8, BLOCK_M), lambda i, j: (0, j)),
        ]
        out_spec = pl.BlockSpec((BLOCK_N, BLOCK_M), lambda i, j: (i, j))

    out = pl.pallas_call(
        _iou_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
        **kwargs,
    )(b1, b2)
    return out[:n, :m]


def _nms_topk_kernel(b_ref, s_ref, out_idx_ref, out_valid_ref, max_out: int):
    """Full truncated greedy NMS in ONE kernel invocation, VMEM-resident.

    The lax formulation (``core/boxes/nms.py::topk_nms``) runs ``max_out``
    XLA while iterations, each re-reading the boxes from HBM; here the
    component-major boxes [8, N] and the score row [1, N] live in VMEM for
    the whole scan: per iteration one max-reduce + one one-vs-all IoU, zero
    HBM round-trips. Exact greedy semantics (strictly-greater suppresses;
    invalid entries carry -inf scores). Mosaic-lowerable by construction:
    no gathers/dynamic slices — the selected box is extracted with a one-hot
    masked reduction and the per-iteration outputs accumulate in loop-carried
    rows, everything 2D.
    """
    b = b_ref[...]  # [8, N] f32, component-major
    n = b.shape[1]
    x1b, y1b, x2b, y2b, z1b, z2b = (b[c : c + 1, :] for c in range(6))
    vol = (x2b - x1b) * (y2b - y1b) * (z2b - z1b)  # [1, N]
    th = s_ref[1:2, :]  # [1, N], every lane = iou threshold
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    m = out_idx_ref.shape[1]
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def step(i, carry):
        scores, idx_row, valid_row = carry  # [1,N] f32, [1,M] i32, [1,M] i32
        best = jnp.max(scores, axis=1, keepdims=True)  # [1, 1]
        alive = best > neg_inf
        # first-max index (argmax tie semantics) via min-over-ties reduction
        is_best = scores == best
        k = jnp.min(
            jnp.where(is_best, iota, jnp.int32(n)), axis=1, keepdims=True
        )  # [1, 1]
        sel_mask = iota == k  # [1, N] one-hot
        sel = jnp.sum(jnp.where(sel_mask, b, 0.0), axis=1, keepdims=True)  # [8,1]
        x1 = jnp.maximum(sel[0:1], x1b)
        y1 = jnp.maximum(sel[1:2], y1b)
        x2 = jnp.minimum(sel[2:3], x2b)
        y2 = jnp.minimum(sel[3:4], y2b)
        z1 = jnp.maximum(sel[4:5], z1b)
        z2 = jnp.minimum(sel[5:6], z2b)
        inter = (
            jnp.maximum(x2 - x1, 0.0)
            * jnp.maximum(y2 - y1, 0.0)
            * jnp.maximum(z2 - z1, 0.0)
        )
        vol_k = (sel[2:3] - sel[0:1]) * (sel[3:4] - sel[1:2]) * (
            sel[5:6] - sel[4:5]
        )  # [1, 1]
        union = jnp.maximum(vol_k + vol - inter, 1e-12)
        suppress = (inter / union) > th
        scores = jnp.where(alive & (suppress | sel_mask), neg_inf, scores)
        write = out_iota == i
        idx_row = jnp.where(write, k, idx_row)
        valid_row = jnp.where(write, alive.astype(jnp.int32), valid_row)
        return scores, idx_row, valid_row

    init = (
        s_ref[0:1, :],
        jnp.zeros((1, m), jnp.int32),
        jnp.zeros((1, m), jnp.int32),
    )
    _, idx_row, valid_row = jax.lax.fori_loop(
        0, max_out, step, init, unroll=False
    )
    out_idx_ref[...] = idx_row
    out_valid_ref[...] = valid_row


@functools.partial(jax.jit, static_argnames=("max_out", "interpret"))
def nms_topk_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas analog of :func:`core.boxes.nms.topk_nms`.

    Returns ``(keep_idx [max_out] int32, keep_valid [max_out] bool)`` in
    descending-score order with identical greedy semantics.
    """
    n = boxes.shape[0]
    n_pad = _round_up(max(n, 8), 128)
    comp = jnp.zeros((8, n_pad), jnp.float32)
    comp = comp.at[:6, :n].set(boxes.astype(jnp.float32).T)
    masked = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    srow = jnp.full((2, n_pad), -jnp.inf, jnp.float32)
    srow = srow.at[0, :n].set(masked)
    # row 1 smuggles the threshold in as data so the kernel stays shape-only
    srow = srow.at[1, :].set(jnp.float32(iou_threshold))

    m_pad = _round_up(max_out, 128)  # full lanes for the output rows
    out_idx, out_valid = pl.pallas_call(
        functools.partial(_nms_topk_kernel, max_out=max_out),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ),
        interpret=interpret,
    )(comp, srow)
    idx = jnp.clip(out_idx[0, :max_out], 0, max(n - 1, 0))
    return idx, out_valid[0, :max_out].astype(bool)


def _suppression_kernel(bi_ref, bj_ref, out_ref):
    """Upper-triangular suppression matrix tile: out[i, j] = 1 where box j
    (higher index = lower score) is suppressed by box i.

    The row/column tiles arrive through BlockSpec index maps (the same array
    passed twice — Mosaic has no in-kernel dynamic_slice of values); the IoU
    threshold rides in component row 6 of the padded component-major layout.
    """
    i_block = pl.program_id(0)
    j_block = pl.program_id(1)
    bi = bi_ref[...]  # [8, BLOCK_N] row-role boxes
    bj = bj_ref[...]  # [8, BLOCK_M] column-role boxes
    thresh = jnp.max(bi[6:7, :], axis=1, keepdims=True)  # [1, 1]

    rows = i_block * BLOCK_N + jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_N, BLOCK_M), 0
    )
    cols = j_block * BLOCK_M + jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_N, BLOCK_M), 1
    )

    x1 = jnp.maximum(bi[0][:, None], bj[0][None, :])
    y1 = jnp.maximum(bi[1][:, None], bj[1][None, :])
    x2 = jnp.minimum(bi[2][:, None], bj[2][None, :])
    y2 = jnp.minimum(bi[3][:, None], bj[3][None, :])
    z1 = jnp.maximum(bi[4][:, None], bj[4][None, :])
    z2 = jnp.minimum(bi[5][:, None], bj[5][None, :])
    inter = (
        jnp.maximum(x2 - x1, 0.0)
        * jnp.maximum(y2 - y1, 0.0)
        * jnp.maximum(z2 - z1, 0.0)
    )
    vol_i = (bi[2] - bi[0]) * (bi[3] - bi[1]) * (bi[5] - bi[4])
    vol_j = (bj[2] - bj[0]) * (bj[3] - bj[1]) * (bj[5] - bj[4])
    union = vol_i[:, None] + vol_j[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)
    out_ref[...] = ((iou > thresh) & (cols > rows)).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def suppression_matrix_pallas(
    boxes_sorted: jnp.ndarray, iou_threshold: float, interpret: bool = False
) -> jnp.ndarray:
    """Bitmask-NMS style suppression matrix for score-sorted boxes
    (the Pallas analog of ``nms.cu``'s block masks): ``out[i, j] = 1`` iff
    ``j > i`` and ``IoU > thresh``. The greedy keep-scan over this matrix is
    O(N) vector work (see ``core/boxes/nms.py::nms_mask``)."""
    n = boxes_sorted.shape[0]
    n_pad = _round_up(max(n, 8), BLOCK_N)
    comp = jnp.zeros((8, n_pad), jnp.float32)
    comp = comp.at[:6, :n].set(boxes_sorted.astype(jnp.float32).T)
    comp = comp.at[6, :].set(jnp.float32(iou_threshold))

    grid = (n_pad // BLOCK_N, n_pad // BLOCK_M)
    out = pl.pallas_call(
        _suppression_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, BLOCK_N), lambda i, j: (0, i)),
            pl.BlockSpec((8, BLOCK_M), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, BLOCK_M), lambda i, j: (i, j)),
        interpret=interpret,
    )(comp, comp)
    return out[:n, :n]
