"""Checkpoint discovery/loading for inference
(``/root/reference/nndet/inference/loading.py:36-147``)."""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional

from nndetection_tpu.inference.predictor import ModelBundle
from nndetection_tpu.utils.io import load_pickle


def load_model_bundle(ckpt_path, name: Optional[str] = None) -> ModelBundle:
    payload = load_pickle(ckpt_path)
    use_swa = payload.get("swa_count", 0) and payload["extra"].get("use_swa", False)
    params = payload["swa_params"] if use_swa else payload["params"]
    return ModelBundle(
        cfg=payload["model_cfg"],
        params=params,
        name=name or Path(ckpt_path).parent.name,
    )


def get_latest_model(train_dir, identifier: str = "last") -> Path:
    train_dir = Path(train_dir)
    cand = train_dir / f"model_{identifier}.ckpt"
    if cand.exists():
        return cand
    matches = sorted(train_dir.glob("model_*.ckpt"))
    if not matches:
        raise FileNotFoundError(f"no checkpoints in {train_dir}")
    return matches[-1]


def load_final_model(train_dir, identifier: str = "last") -> ModelBundle:
    return load_model_bundle(get_latest_model(train_dir, identifier))


def load_all_models(
    model_dir, identifier: str = "last", num_folds: int = 5
) -> List[ModelBundle]:
    """Load all fold checkpoints (``fold0..foldN`` subdirs or ``consolidated``)."""
    model_dir = Path(model_dir)
    consolidated = model_dir / "consolidated"
    bundles = []
    if consolidated.is_dir():
        for ckpt in sorted(consolidated.glob("model_fold*.ckpt")):
            bundles.append(load_model_bundle(ckpt, name=ckpt.stem))
        if bundles:
            return bundles
    for fold in range(num_folds):
        fold_dir = model_dir / f"fold{fold}"
        if (fold_dir / f"model_{identifier}.ckpt").exists():
            bundles.append(
                load_model_bundle(
                    fold_dir / f"model_{identifier}.ckpt", name=f"fold{fold}"
                )
            )
    if not bundles:
        raise FileNotFoundError(f"no fold checkpoints found in {model_dir}")
    return bundles
