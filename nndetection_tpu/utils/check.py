"""Environment guard and dataset consistency checks
(``/root/reference/nndet/utils/check.py:20-315``)."""
from __future__ import annotations

import functools
import logging
import os
from pathlib import Path
from typing import Callable, List

import numpy as np

log = logging.getLogger("nndet")


def env_guard(fn: Callable) -> Callable:
    """Require the ``det_data``/``det_models`` environment contract before
    running an entry point; warn on thread oversubscription."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        missing = [v for v in ("det_data", "det_models") if not os.environ.get(v)]
        if missing:
            raise EnvironmentError(
                f"required environment variables not set: {missing} "
                "(export det_data=... det_models=...)"
            )
        omp = os.environ.get("OMP_NUM_THREADS")
        if omp not in (None, "1"):
            log.warning(
                "OMP_NUM_THREADS=%s — the host pipeline assumes 1 to avoid "
                "thread oversubscription", omp,
            )
        return fn(*args, **kwargs)

    return wrapper


def check_data_and_label_consistency(task_dir, full: bool = False) -> List[str]:
    """Validate the raw_splitted contract; with ``full``, also check image/
    label geometry agreement (shape + spacing)."""
    from nndetection_tpu.data import nifti
    from nndetection_tpu.data.dataset import DatasetInfo, discover_cases

    task_dir = Path(task_dir)
    problems: List[str] = []
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    cases = discover_cases(
        task_dir / "raw_splitted" / "imagesTr",
        task_dir / "raw_splitted" / "labelsTr",
    )
    if not cases:
        problems.append("no training cases found")
    for c in cases:
        if len(c.images) != info.num_modalities:
            problems.append(
                f"{c.case_id}: {len(c.images)} modalities, expected {info.num_modalities}"
            )
        if c.label is None:
            problems.append(f"{c.case_id}: missing label")
            continue
        if c.label_json is None:
            problems.append(f"{c.case_id}: missing instances json")
            continue
        if full:
            img, ispacing, _ = nifti.load(c.images[0])
            seg, lspacing, _ = nifti.load(c.label)
            if img.shape != seg.shape:
                problems.append(
                    f"{c.case_id}: image {img.shape} vs label {seg.shape}"
                )
            if not np.allclose(ispacing, lspacing, atol=1e-4):
                problems.append(
                    f"{c.case_id}: spacing mismatch {ispacing} vs {lspacing}"
                )
            ids = {int(v) for v in np.unique(seg) if v > 0}
            declared = set(c.instances().keys())
            if ids - declared:
                problems.append(
                    f"{c.case_id}: instances {sorted(ids - declared)} present in "
                    "the label volume but missing from the json"
                )
    return problems
