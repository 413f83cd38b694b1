"""Install/import smoke tests (the reference's only automated tests were
import smokes, tests/test_imports.py; ours cover the public surface)."""
import importlib

import pytest

ENTRY_POINTS = [
    ("nndetection_tpu.cli.prep", "main"),
    ("nndetection_tpu.cli.train", "main"),
    ("nndetection_tpu.cli.sweep", "main"),
    ("nndetection_tpu.cli.predict", "main"),
    ("nndetection_tpu.cli.evaluate", "main"),
    ("nndetection_tpu.cli.consolidate", "main"),
    ("nndetection_tpu.cli.example", "main"),
    ("nndetection_tpu.cli.utils", "main_unpack"),
    ("nndetection_tpu.cli.utils", "main_boxes2nii"),
    ("nndetection_tpu.cli.utils", "main_seg2nii"),
    ("nndetection_tpu.cli.utils", "main_env"),
    ("nndetection_tpu.cli.convert", "main_seg2det"),
    ("nndetection_tpu.cli.convert", "main_cls2fg"),
    ("nndetection_tpu.cli.nnunet_interop", "main"),
]


@pytest.mark.parametrize("module,fn", ENTRY_POINTS)
def test_console_entry_points_resolve(module, fn):
    mod = importlib.import_module(module)
    assert callable(getattr(mod, fn))


def test_native_lib_available():
    from nndetection_tpu.ops import HAS_NATIVE

    # the Makefile auto-build should succeed on any box with g++
    assert HAS_NATIVE


def test_registries_populated():
    import nndetection_tpu.modules  # noqa: F401
    import nndetection_tpu.data.aug_presets  # noqa: F401
    import nndetection_tpu.data.loader  # noqa: F401
    from nndetection_tpu.utils.registry import (
        AUGMENTATION_REGISTRY,
        DATALOADER_REGISTRY,
        MODULE_REGISTRY,
        PLANNER_REGISTRY,
    )

    assert "RetinaUNetV001" in MODULE_REGISTRY
    assert "RetinaUNetV001TopK" in MODULE_REGISTRY
    assert (
        MODULE_REGISTRY["RetinaUNetV001TopK"].config_overrides["seg_loss_type"]
        == "dice_topk"
    )
    assert "D3V001" in PLANNER_REGISTRY
    assert "DataLoader3DOffset" in DATALOADER_REGISTRY
    assert "base_more" in AUGMENTATION_REGISTRY
