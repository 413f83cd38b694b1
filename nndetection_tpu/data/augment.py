"""On-device, jitted data augmentation.

TPU-first redesign of the reference's CPU-worker batchgenerators stacks
(``/root/reference/nndet/io/augmentation/bg_aug.py:65-492``): the host only
memmaps enlarged raw patches; every transform (affine rotation/scale, mirror,
Gaussian noise/blur, brightness, contrast, low-res simulation, gamma) runs as
part of the jitted step on device. All randomness is explicit ``jax.random``
keys (fixing the reference's unseeded workers), and the compute cost is
constant per step: the affine resample always runs (with an identity matrix
when not triggered) so XLA sees one static graph.

The host-side generator patch is enlarged for rotation/scale like
``get_patch_size`` (``/root/reference/nndet/io/augmentation/base.py:24-67``);
the affine gather writes directly at the final patch size.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates


@dataclass(frozen=True)
class AugmentConfig:
    """Parameter ranges follow the ``base_more`` preset
    (``bg_aug.py:192-280``)."""

    patch_size: Tuple[int, ...] = (96, 96, 96)
    # spatial
    p_rotation: float = 0.2
    rotation_deg: float = 30.0
    p_scale: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    mirror_axes: Tuple[int, ...] = (0, 1, 2)
    # elastic deformation (reference SpatialTransform ``do_elastic`` — smoothed
    # uniform noise displacement field, ``alpha``-scaled, Gaussian ``sigma``;
    # enabled in the reference ``default``/``insane`` presets,
    # ``conf/train/augmentation/default.yaml:8-11``)
    p_elastic: float = 0.0
    elastic_alpha: Tuple[float, float] = (0.0, 900.0)
    elastic_sigma: Tuple[float, float] = (9.0, 13.0)
    # dummy-2D anisotropic mode (reference ``bg_aug.py:68-90`` +
    # ``bg_module.py:170-176``): spatial transforms act only in the (1,2)
    # plane — in-plane rotation up to ±180°, in-plane scale/elastic, axis 0
    # untouched. Triggered by the plan when max(patch)/min(patch) > 3.
    dummy_2d: bool = False
    # zero data outside the nonzero-normalization mask after the spatial
    # transform (reference ``MaskTransform(set_outside_to=0)``); outside
    # voxels carry seg == -1
    mask_norm_zero: bool = False
    # intensity
    p_noise: float = 0.1
    noise_var: Tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    blur_sigma: Tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: Tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: Tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    lowres_zoom: Tuple[float, float] = (0.5, 1.0)
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)
    p_gamma_invert: float = 0.1
    # MXU shear-decomposition resample instead of gather-based
    # map_coordinates (see data/affine_mxu.py) — ~10x faster on TPU
    use_mxu_resample: bool = True


def get_generator_patch_size(
    final_patch_size: Sequence[int],
    rotation_deg: float = 30.0,
    scale_min: float = 0.7,
    dummy_2d: bool = False,
) -> Tuple[int, ...]:
    """Enlarged host-side patch so rotation/scale never sample outside
    (reference ``get_patch_size`` semantics). In dummy-2D mode only the
    in-plane axes are enlarged (``bg_aug.py:76-90``)."""
    ps = np.asarray(final_patch_size, dtype=np.float64)
    # worst-case in-range rotation: the |cos|+|sin| bound peaks at 45 deg
    rot = np.deg2rad(min(abs(rotation_deg), 45.0))
    out = ps.copy()
    dim = len(ps)
    if dummy_2d and dim == 3:
        a, b = 1, 2
        ca, sa = abs(np.cos(rot)), abs(np.sin(rot))
        out[a] = max(out[a], ca * ps[a] + sa * ps[b])
        out[b] = max(out[b], sa * ps[a] + ca * ps[b])
        out[1:] = out[1:] / scale_min
        return tuple(int(np.ceil(v)) for v in out)
    for axis in range(dim if dim == 3 else 1):
        # rotation around `axis` mixes the other two axes
        others = [i for i in range(dim) if i != axis] if dim == 3 else [0, 1]
        a, b = others
        ca, sa = abs(np.cos(rot)), abs(np.sin(rot))
        na = ca * ps[a] + sa * ps[b]
        nb = sa * ps[a] + ca * ps[b]
        out[a] = max(out[a], na)
        out[b] = max(out[b], nb)
    out = out / scale_min
    return tuple(int(np.ceil(v)) for v in out)


def generator_patch_size_for(cfg: AugmentConfig) -> Tuple[int, ...]:
    """Generator patch for a concrete augmentation config."""
    return get_generator_patch_size(
        cfg.patch_size,
        rotation_deg=cfg.rotation_deg,
        scale_min=cfg.scale_range[0],
        dummy_2d=cfg.dummy_2d,
    )


def _rotation_matrix_3d(angles: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _sample_affine_params(key: jax.Array, cfg: AugmentConfig):
    """Draw (angles [3], scale [3]) with the preset's trigger probabilities.

    In dummy-2D mode only the in-plane rotation (about axis 0) and in-plane
    scale are drawn (``bg_module.py:170-176``: ``rotation_x`` becomes the 2D
    in-plane rotation, axis 0 is untouched)."""
    k_rot, k_rot_p, k_scale, k_scale_p = jax.random.split(key, 4)
    max_rad = jnp.deg2rad(cfg.rotation_deg)
    angles = jax.random.uniform(k_rot, (3,), minval=-max_rad, maxval=max_rad)
    do_rot = jax.random.uniform(k_rot_p) < cfg.p_rotation
    angles = jnp.where(do_rot, angles, 0.0)
    scale = jax.random.uniform(
        k_scale, (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    do_scale = jax.random.uniform(k_scale_p) < cfg.p_scale
    scale = jnp.where(do_scale, scale, 1.0)
    if cfg.dummy_2d:
        angles = angles * jnp.asarray([1.0, 0.0, 0.0])
        scale_vec = jnp.stack([jnp.ones(()), scale, scale])
    else:
        scale_vec = jnp.broadcast_to(scale, (3,))
    return angles, scale_vec


def _elastic_field(
    key: jax.Array,
    out_shape: Sequence[int],
    cfg: AugmentConfig,
    lattice_stride: int = 4,
) -> jnp.ndarray:
    """Smoothed random displacement field ``[dim, *out_shape]`` (reference
    SpatialTransform elastic: ``gaussian_filter(uniform(-1,1), sigma) * alpha``).

    TPU formulation: the field is band-limited by a large Gaussian
    (sigma 9-13 voxels), so it is sampled on a stride-``lattice_stride``
    lattice, blurred there with ``sigma/stride``, and upsampled linearly —
    numerically close to the full-resolution filter at ~64x less VPU work."""
    dim = len(out_shape)
    k_n, k_a, k_s, k_p = jax.random.split(key, 4)
    alpha = jax.random.uniform(
        k_a, (), minval=cfg.elastic_alpha[0], maxval=cfg.elastic_alpha[1]
    )
    sigma = jax.random.uniform(
        k_s, (), minval=cfg.elastic_sigma[0], maxval=cfg.elastic_sigma[1]
    )
    coarse = tuple(-(-s // lattice_stride) + 1 for s in out_shape)
    noise = jax.random.uniform(k_n, (dim, *coarse), minval=-1.0, maxval=1.0)
    sig_c = sigma / lattice_stride
    for ax in range(dim):
        noise = _gaussian_blur_1d(noise, sig_c, axis=ax + 1, ksize=9)
    # the Gaussian blur shrinks the noise amplitude by ~1/(2*sqrt(pi)*sigma)^(d/2);
    # batchgenerators keeps the same convention (filter then scale by alpha)
    field = jax.image.resize(noise, (dim, *out_shape), method="linear") * alpha
    do_el = jax.random.uniform(k_p) < cfg.p_elastic
    field = field * do_el
    if cfg.dummy_2d:
        field = field * jnp.asarray([0.0] + [1.0] * (dim - 1)).reshape(
            dim, *([1] * dim)
        )
    return field


def _affine_coords(
    key: jax.Array,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    cfg: AugmentConfig,
) -> jnp.ndarray:
    """Sample coordinates ``[dim, *out_shape]`` in the input patch implementing
    random rotation+scaling about the patch center."""
    dim = len(out_shape)
    angles, scale_vec = _sample_affine_params(key, cfg)

    rot = _rotation_matrix_3d(angles) if dim == 3 else _rotation_matrix_3d(
        jnp.array([0.0, 0.0, angles[2]])
    )[:2, :2]
    mat = rot @ jnp.diag(scale_vec[:dim])

    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in out_shape], indexing="ij"
    )
    out_center = jnp.asarray([(s - 1) / 2.0 for s in out_shape])
    in_center = jnp.asarray([(s - 1) / 2.0 for s in in_shape])
    coords = jnp.stack([g - c for g, c in zip(grids, out_center)], axis=0)
    coords = jnp.tensordot(mat, coords.reshape(dim, -1), axes=1).reshape(
        dim, *out_shape
    )
    return coords + in_center.reshape(dim, *([1] * dim))


def _gaussian_blur_1d(x: jnp.ndarray, sigma: jnp.ndarray, axis: int, ksize: int = 7):
    offs = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2
    w = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    w = w / jnp.sum(w)
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    xr = x.reshape(-1, 1, shape[-1])
    out = jax.lax.conv_general_dilated(
        xr, w.reshape(1, 1, ksize), window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return jnp.moveaxis(out.reshape(shape), -1, axis)


def augment_sample(
    key: jax.Array,
    data: jnp.ndarray,  # [*gen_patch, C]
    seg: jnp.ndarray,  # [*gen_patch] int
    cfg: AugmentConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment one sample; crops from the generator patch to ``cfg.patch_size``."""
    out_shape = tuple(cfg.patch_size)
    dim = len(out_shape)
    in_shape = seg.shape
    keys = jax.random.split(key, 17)

    # --- spatial: affine rotation/scale (always-resample design) ---
    # low-resolution simulation is FOLDED INTO the resample (quantized source
    # positions) so it costs zero additional passes/gathers
    zoom = jax.random.uniform(
        keys[9], (), minval=cfg.lowres_zoom[0], maxval=cfg.lowres_zoom[1]
    )
    do_lowres = (jax.random.uniform(keys[14]) < cfg.p_lowres) & (cfg.p_lowres > 0)

    # elastic deformation needs arbitrary (non-affine) source coordinates, so
    # presets enabling it take the gather path; the MXU shear chain covers the
    # pure-affine presets (incl. the published default `base_more`)
    # (the MXU shear chain is 3D-only; 2D volumes are small enough that the
    # gather path is not a bottleneck)
    use_gather = (not cfg.use_mxu_resample) or cfg.p_elastic > 0 or dim == 2
    if not use_gather:
        from nndetection_tpu.data.affine_mxu import (
            affine_resample_mxu,
            affine_resample_seg_mxu,
        )

        angles, scale_vec = _sample_affine_params(keys[0], cfg)
        # shear chain in bf16: weights are in [0,1] and the MXU runs bf16 at
        # double rate with half the HBM traffic; data is augmentation input
        data_out = affine_resample_mxu(
            data.astype(jnp.bfloat16),
            out_shape,
            angles,
            scale_vec,
            lowres_zoom=(do_lowres, zoom),
            inplane_only=cfg.dummy_2d,
        ).astype(data.dtype)
        seg_out = affine_resample_seg_mxu(
            seg, out_shape, angles, scale_vec, inplane_only=cfg.dummy_2d
        )
    else:
        coords = _affine_coords(keys[0], in_shape, out_shape, cfg)
        if cfg.p_elastic > 0:
            coords = coords + _elastic_field(keys[16], out_shape, cfg)
        coords_q = jnp.floor(coords * zoom) / jnp.maximum(zoom, 1e-3)
        coords = jnp.where(do_lowres, coords_q, coords)
        data_out = jnp.stack(
            [
                map_coordinates(data[..., c], list(coords), order=1, mode="constant")
                for c in range(data.shape[-1])
            ],
            axis=-1,
        )
        seg_out = map_coordinates(
            seg.astype(jnp.float32), list(coords), order=0, mode="constant", cval=-1.0
        ).astype(jnp.int32)

    # --- mirror (p=0.5 per allowed axis) ---
    flips = jax.random.uniform(keys[1], (dim,)) < 0.5
    for ax in cfg.mirror_axes:
        if ax >= dim:  # 3D default (0, 1, 2) on a 2D patch
            continue
        data_out = jnp.where(
            flips[ax], jnp.flip(data_out, axis=ax), data_out
        )
        seg_out = jnp.where(flips[ax], jnp.flip(seg_out, axis=ax), seg_out)

    # --- intensity (applied to all channels jointly, like the presets) ---
    x = data_out
    # gaussian noise
    nvar = jax.random.uniform(keys[2], (), minval=cfg.noise_var[0], maxval=cfg.noise_var[1])
    noise = jax.random.normal(keys[3], x.shape) * jnp.sqrt(nvar)
    x = jnp.where(jax.random.uniform(keys[4]) < cfg.p_noise, x + noise, x)
    # gaussian blur (separable)
    sigma = jax.random.uniform(
        keys[5], (), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]
    )
    blurred = x
    for ax in range(dim):
        blurred = _gaussian_blur_1d(blurred, sigma, axis=ax)
    x = jnp.where(jax.random.uniform(keys[6]) < cfg.p_blur, blurred, x)
    # brightness (multiplicative)
    bright = jax.random.uniform(
        keys[7], (), minval=cfg.brightness_range[0], maxval=cfg.brightness_range[1]
    )
    x = jnp.where(jax.random.uniform(keys[12]) < cfg.p_brightness, x * bright, x)
    # contrast (preserve mean)
    factor = jax.random.uniform(
        keys[8], (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    mean = jnp.mean(x)
    x = jnp.where(
        jax.random.uniform(keys[13]) < cfg.p_contrast,
        (x - mean) * factor + mean,
        x,
    )
    # (low-res simulation folded into the affine gather above)
    # gamma with retained stats
    gamma = jax.random.uniform(
        keys[10], (), minval=cfg.gamma_range[0], maxval=cfg.gamma_range[1]
    )
    mn, sd = jnp.mean(x), jnp.std(x) + 1e-8
    lo, rng_ = jnp.min(x), jnp.max(x) - jnp.min(x) + 1e-8
    invert = jax.random.uniform(keys[11], ()) < cfg.p_gamma_invert
    # clamp into [0,1]: TPU divides via approximate reciprocal, so the max
    # voxel's ratio can round slightly ABOVE 1; under invert that makes the
    # pow base negative -> NaN, which the retain-stats normalization then
    # spreads to every voxel (the rare all-losses-NaN train steps seen on
    # real toy runs — root-caused via scripts_dev/nan_hunt.py)
    xn = jnp.clip((x - lo) / rng_, 0.0, 1.0)
    xn = jnp.where(invert, 1.0 - xn, xn)
    xg = xn**gamma
    xg = jnp.where(invert, 1.0 - xg, xg)
    xg = xg * rng_ + lo
    xg = (xg - jnp.mean(xg)) / (jnp.std(xg) + 1e-8) * sd + mn
    x = jnp.where(jax.random.uniform(keys[15]) < cfg.p_gamma, xg, x)

    # zero data outside the nonzero-normalization mask (reference
    # ``MaskTransform(mask_idx_in_seg=0, set_outside_to=0)``, applied last in
    # the preset stacks); outside voxels carry seg == -1 from cropping
    if cfg.mask_norm_zero:
        x = jnp.where((seg_out < 0)[..., None], 0.0, x)

    return x, seg_out


def augment_batch(
    key: jax.Array, data: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped :func:`augment_sample` over the batch.

    Args:
        data: ``[B, *gen_patch, C]``; seg: ``[B, *gen_patch]``
    Returns:
        ``(data [B, *patch, C], seg [B, *patch])``
    """
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: augment_sample(k, d, s, cfg))(keys, data, seg)


def center_crop_batch(
    data: jnp.ndarray, seg: jnp.ndarray, patch_size: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """No-augmentation validation path: center crop to the final patch."""
    in_shape = seg.shape[1:]
    starts = [(i - p) // 2 for i, p in zip(in_shape, patch_size)]
    sl = (slice(None),) + tuple(
        slice(s, s + p) for s, p in zip(starts, patch_size)
    )
    return data[sl + (slice(None),)], seg[sl]
