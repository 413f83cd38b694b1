"""Affine volume resampling as MXU matmuls (gather-free).

TPU has no vector gather: ``map_coordinates`` lowers to element gathers that
fetch a full (8,128) memory tile per element — profiling showed the 8-corner
trilinear gathers consuming ~70% of the train step. This module reformulates
the affine resample as dense banded matrix multiplications, which run on the
MXU at teraflop rates:

* a 3D rotation ``Rz·Ry·Rx`` is decomposed into three planar rotations, each
  expressed as three 1D shears (the classic Paeth/Tanaka decomposition
  ``R(t) = Sh_u(-tan(t/2)) · Sh_w(sin t) · Sh_u(-tan(t/2))``);
* every shear is a 1D linear interpolation along one axis whose offset is
  linear in a second axis — i.e. one einsum with a banded weight tensor
  ``[dep, src, dst]`` built from iotas;
* the final (an)isotropic scale + center crop is a separable 1D interpolation
  matmul per axis mapping generator-patch length -> output length.

Linear (hat) weights reproduce ``order=1``; the nearest variant (one-hot
weights) transforms label volumes exactly. Out-of-bounds source positions get
all-zero weight rows; label volumes are shifted by +2 before / -2 after so
"outside" decodes to cval -1 (and background to 0).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hat_weights(src_len: int, dst_len: int, src_pos: jnp.ndarray, dtype) -> jnp.ndarray:
    """Linear-interp weights. ``src_pos``: ``[..., dst_len]`` source coordinate
    of each output index. Returns ``[..., src_len, dst_len]``.

    Positions/differences are computed in f32 (bf16 cannot represent voxel
    indices beyond ~256 exactly); only the final in-[0,1] weights are cast to
    the compute dtype."""
    src_idx = jnp.arange(src_len, dtype=jnp.float32)
    shape = (1,) * (src_pos.ndim - 1)
    diff = src_idx.reshape(*shape, src_len, 1) - src_pos[..., None, :].astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
    return w.astype(dtype)


def _nearest_weights(src_len: int, dst_len: int, src_pos: jnp.ndarray, dtype) -> jnp.ndarray:
    src_idx = jnp.arange(src_len, dtype=jnp.float32)
    shape = (1,) * (src_pos.ndim - 1)
    nearest = jnp.round(src_pos)
    w = (src_idx.reshape(*shape, src_len, 1) == nearest[..., None, :])
    return w.astype(dtype)


_EINSUM = {
    # shear along axis `a` with offset linear in axis `b`; volume [D,H,W,C];
    # weight tensor is [dep_len, src_len, dst_len]
    (0, 1): "dhwc,hdD->Dhwc",
    (0, 2): "dhwc,wdD->Dhwc",
    (1, 0): "dhwc,dhH->dHwc",
    (1, 2): "dhwc,whH->dHwc",
    (2, 0): "dhwc,dwW->dhWc",
    (2, 1): "dhwc,hwW->dhWc",
}


def _shear(
    vol: jnp.ndarray,  # [D, H, W, C]
    axis: int,
    dep_axis: int,
    alpha: jnp.ndarray,
    nearest: bool,
) -> jnp.ndarray:
    """Resample ``vol`` along ``axis``: ``src = dst + alpha * (dep - c_dep)``."""
    lens = vol.shape[:3]
    length = lens[axis]
    dep_len = lens[dep_axis]
    c_axis = (length - 1) / 2.0
    c_dep = (dep_len - 1) / 2.0
    dst = jnp.arange(length, dtype=jnp.float32)
    dep = jnp.arange(dep_len, dtype=jnp.float32)
    # src position for every (dep, dst): centered shear
    src = (dst[None, :] - c_axis) + alpha * (dep[:, None] - c_dep) + c_axis
    wfn = _nearest_weights if nearest else _hat_weights
    w = wfn(length, length, src, vol.dtype)  # [dep, src, dst]
    return jnp.einsum(_EINSUM[(axis, dep_axis)], vol, w)


def _planar_rotation(vol, axis_u: int, axis_w: int, theta, nearest: bool):
    """Rotate the (axis_u, axis_w) plane by theta via three shears."""
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    vol = _shear(vol, axis_u, axis_w, alpha, nearest)
    vol = _shear(vol, axis_w, axis_u, beta, nearest)
    vol = _shear(vol, axis_u, axis_w, alpha, nearest)
    return vol


def _scale_crop_axis(
    vol: jnp.ndarray,
    axis: int,
    out_len: int,
    scale,
    nearest: bool,
    lowres_zoom=None,
) -> jnp.ndarray:
    """Final separable pass: ``src = (dst - c_out) * scale + c_in``.

    ``lowres_zoom`` (traced ``(do, zoom)``) quantizes the source positions to
    a coarse grid — the low-resolution-simulation augmentation folded into
    the same matmul at zero extra cost."""
    src_len = vol.shape[axis]
    c_in = (src_len - 1) / 2.0
    c_out = (out_len - 1) / 2.0
    dst = jnp.arange(out_len, dtype=jnp.float32)
    src = (dst - c_out) * scale + c_in
    if lowres_zoom is not None:
        do, zoom = lowres_zoom
        src_q = jnp.floor(src * zoom) / jnp.maximum(zoom, 1e-3)
        src = jnp.where(do, src_q, src)
    wfn = _nearest_weights if nearest else _hat_weights
    w = wfn(src_len, out_len, src, vol.dtype)  # [src, dst]
    eq = {0: "dhwc,dD->Dhwc", 1: "dhwc,hH->dHwc", 2: "dhwc,wW->dhWc"}[axis]
    return jnp.einsum(eq, vol, w)


def affine_resample_mxu(
    vol: jnp.ndarray,  # [D, H, W, C]
    out_shape: Sequence[int],
    angles: jnp.ndarray,  # [3] rotation about axes 0/1/2
    scale,
    nearest: bool = False,
    lowres_zoom=None,
    inplane_only: bool = False,
) -> jnp.ndarray:
    """Sample ``vol`` under the affine ``src = R(angles)·scale·(dst - c_out) + c_in``
    (the same map as :func:`nndetection_tpu.data.augment._affine_coords`) using
    only matmuls.

    Composition: the isotropic scale commutes with the rotation
    (``R·s = s·R``), so the cheap separable scale pass runs FIRST, mapping the
    generator patch down to a small intermediate grid that just contains the
    rotated output extent; the nine shear passes then run at ~5x fewer voxels
    and the final step is a free center crop.

    ``scale`` may be a scalar or a per-axis ``[3]`` vector; a per-axis scale
    is only valid when the axes it distinguishes are not mixed by the
    rotation — the dummy-2D mode (``inplane_only=True``: rotation confined to
    the (1,2) plane, ``scale = (1, s, s)``) satisfies this because equal
    in-plane scales commute with in-plane rotations. ``inplane_only`` also
    skips the two out-of-plane shear chains entirely.
    """
    ax, ay, az = angles[0], angles[1], angles[2]
    # intermediate grid: output extent inflated for the worst-case rotation
    # (static bound; same formula as the generator-patch enlargement).
    # mid keeps the OUTPUT's parity so the final center crop is an exact
    # integer slice; any fractional half-voxel offset then lives in the scale
    # pass exactly where the single-pass formulation had it.
    def _mid(o, s):
        o, s = int(o), int(s)
        margin = int(np.ceil(o * 0.45)) + 2
        m = o + margin + (margin % 2)
        cap = s - ((s - o) % 2)
        return max(o, min(m, cap))

    if inplane_only:
        # axis 0 is never resampled in dummy-2D mode: mid == out along it
        mid_shape = (int(out_shape[0]),) + tuple(
            _mid(o, s) for o, s in zip(out_shape[1:], vol.shape[1:3])
        )
    else:
        mid_shape = tuple(_mid(o, s) for o, s in zip(out_shape, vol.shape[:3]))
    scale_vec = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (3,))
    for axis in range(3):
        vol = _scale_crop_axis(
            vol, axis, mid_shape[axis], scale_vec[axis], nearest, lowres_zoom
        )
    # rotation matrices act on coordinate components (0,1,2); "rx" mixes (1,2),
    # "ry" mixes (0,2), "rz" mixes (0,1) — mirroring _rotation_matrix_3d
    if not inplane_only:
        vol = _planar_rotation(vol, 0, 1, az, nearest)
        vol = _planar_rotation(vol, 0, 2, -ay, nearest)
    vol = _planar_rotation(vol, 1, 2, ax, nearest)
    # centered crop mid -> out (pure slice)
    starts = [(m - int(o)) // 2 for m, o in zip(mid_shape, out_shape)]
    return vol[
        starts[0] : starts[0] + int(out_shape[0]),
        starts[1] : starts[1] + int(out_shape[1]),
        starts[2] : starts[2] + int(out_shape[2]),
    ]


def affine_resample_seg_mxu(
    seg: jnp.ndarray,  # [D, H, W] int
    out_shape: Sequence[int],
    angles: jnp.ndarray,
    scale,
    cval: int = -1,
    lowres_zoom=None,
    inplane_only: bool = False,
) -> jnp.ndarray:
    """Nearest-neighbor label transform; out-of-bounds voxels become ``cval``."""
    shifted = (seg.astype(jnp.float32) + 2.0)[..., None]  # outside -> 0 weight sum
    out = affine_resample_mxu(
        shifted, out_shape, angles, scale, nearest=True, lowres_zoom=lowres_zoom,
        inplane_only=inplane_only,
    )[..., 0]
    out = jnp.round(out).astype(jnp.int32) - 2
    return jnp.where(out < -1, cval, jnp.maximum(out, cval))
