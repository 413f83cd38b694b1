"""Lightweight experiment tracking (replaces the reference's MLflow logger,
``scripts/train.py:188-202``): appends metric rows to ``metrics.jsonl`` and
dumps resolved params/tags once per run. File-based so it works on air-gapped
TPU hosts; an MLflow exporter can consume the jsonl offline.
"""
from __future__ import annotations

import json
import platform
import time
from pathlib import Path
from typing import Any, Dict, Optional


class RunTracker:
    def __init__(self, run_dir, params: Optional[Dict[str, Any]] = None,
                 tags: Optional[Dict[str, str]] = None):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_path = self.run_dir / "metrics.jsonl"
        meta = {
            "start_time": time.time(),
            "host": platform.node(),
            "platform": platform.platform(),
            "python": platform.python_version(),
            "tags": tags or {},
        }
        # reproducibility metadata, the reference's meta.json analog
        # (``/root/reference/scripts/train.py:215-259``: versions/date/git)
        try:
            import jax

            meta["jax_version"] = jax.__version__
            meta["jax_backend"] = jax.default_backend()
        except Exception:  # noqa: BLE001 — tracking must never break a run
            pass
        try:
            import subprocess

            meta["framework_git"] = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=Path(__file__).resolve().parent,
                capture_output=True, text=True, timeout=5,
            ).stdout.strip() or None
        except Exception:  # noqa: BLE001
            pass
        with open(self.run_dir / "run_meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        if params is not None:
            with open(self.run_dir / "params.json", "w") as f:
                json.dump(params, f, indent=2, default=str)

    def log_metrics(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time()}
        row.update(
            {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        )
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def read_metrics(self):
        if not self.metrics_path.exists():
            return []
        with open(self.metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]
