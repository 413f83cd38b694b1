"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

SPMD code paths are exercised on a host-platform device mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding is
tested without TPU hardware (SURVEY.md §4).
"""
import os

# Must run before jax is imported anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

# The axon-tunnel JAX build ignores the JAX_PLATFORMS env var; force the CPU
# backend through the config API so tests never run over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Files whose tests jit-compile full models / run training loops; they are
# deselected by default (pyproject addopts `-m "not slow"`) and run with
# `pytest -m slow` so the default suite stays fast on this 1-core host.
_SLOW_FILES = {
    "test_e2e.py",
    "test_trainer.py",
    "test_model.py",
    "test_aug_consistency.py",
    "test_deep_supervision.py",
    "test_spatial.py",
    "test_2d.py",
    "test_decoder_variants.py",
}


def pytest_collection_modifyitems(config, items):
    import pathlib

    for item in items:
        if pathlib.Path(str(item.fspath)).name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(42)
