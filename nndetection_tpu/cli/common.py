"""Shared CLI plumbing: env contract, task resolution, logging."""
from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

from nndetection_tpu.data.dataset import get_task_dir
from nndetection_tpu.utils.config import compose, env_paths

log = logging.getLogger("nndet")


def setup_logging(log_file: Path = None, verbose: bool = True) -> None:
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s | %(levelname)s | %(message)s",
        handlers=handlers,
        force=True,
    )


def resolve_task(task: str) -> Path:
    return get_task_dir(task)


def resolve_model_dir(task_dir: Path, module: str = "RetinaUNetV001", plan: str = "D3V001_3d") -> Path:
    models_root = Path(os.environ.get("det_models", "."))
    return models_root / task_dir.name / f"{module}_{plan}"


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("task", type=str, help="task name or id (e.g. Task000D3_Example)")
    p.add_argument(
        "-o", "--overrides", nargs="*", default=[], help="config overrides key=value"
    )
    return p
