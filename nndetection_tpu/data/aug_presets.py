"""Augmentation presets mirroring the reference's registry
(``/root/reference/nndet/io/augmentation/bg_aug.py:65-492``):
``no_aug`` / ``default`` / ``base_more`` (published default) / ``more`` /
``insane``, registered in ``AUGMENTATION_REGISTRY``.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Sequence, Tuple

from nndetection_tpu.data.augment import AugmentConfig
from nndetection_tpu.utils.registry import AUGMENTATION_REGISTRY


def _base(patch_size: Sequence[int]) -> AugmentConfig:
    return AugmentConfig(patch_size=tuple(patch_size))


@AUGMENTATION_REGISTRY.register(name="no_aug")
def no_aug(patch_size: Sequence[int]) -> AugmentConfig:
    return replace(
        _base(patch_size),
        p_rotation=0.0, p_scale=0.0, p_noise=0.0, p_blur=0.0,
        p_brightness=0.0, p_contrast=0.0, p_lowres=0.0, p_gamma=0.0,
        mirror_axes=(),
    )


@AUGMENTATION_REGISTRY.register(name="default")
def default(patch_size: Sequence[int]) -> AugmentConfig:
    return replace(_base(patch_size), p_lowres=0.0, p_contrast=0.0, p_brightness=0.0)


@AUGMENTATION_REGISTRY.register(name="base_more")
def base_more(patch_size: Sequence[int]) -> AugmentConfig:
    """The published default (conf/train/v001.yaml -> augmentation: base_more)."""
    return _base(patch_size)


@AUGMENTATION_REGISTRY.register(name="more")
def more(patch_size: Sequence[int]) -> AugmentConfig:
    return replace(
        _base(patch_size),
        p_rotation=0.3, p_scale=0.3, scale_range=(0.65, 1.6),
        p_noise=0.15, p_blur=0.25, p_brightness=0.25, p_contrast=0.25,
        p_lowres=0.3, p_gamma=0.3,
    )


@AUGMENTATION_REGISTRY.register(name="insane")
def insane(patch_size: Sequence[int]) -> AugmentConfig:
    return replace(
        _base(patch_size),
        p_rotation=0.5, rotation_deg=40.0, p_scale=0.5, scale_range=(0.6, 1.8),
        p_noise=0.25, p_blur=0.35, p_brightness=0.35, p_contrast=0.35,
        p_lowres=0.4, p_gamma=0.4, p_gamma_invert=0.2,
    )


def get_augmentation(name: str, patch_size: Sequence[int]) -> AugmentConfig:
    return AUGMENTATION_REGISTRY[name](patch_size)
