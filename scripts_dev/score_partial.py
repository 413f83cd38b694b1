"""CPU-only partial CPM/box-eval scorer for the LUNA-proxy CV run.

The proxy driver (``scripts_dev/luna_proxy.py``) scores CPM only after ALL
requested folds complete — a wall-clock truncation mid-fold would leave the
round with zero accuracy evidence. This scorer snapshots the metric from
whatever folds HAVE finished train+sweep (``foldK/plan_inference.pkl``
present): it materializes the restored val predictions from the sweep's
saved ensembler states (zero device work), pools them, exports the
world-coordinate CPM csv, and scores FROC/CPM against the union of the
completed folds' val splits (missing cases count as misses, per the
round-3 ADVICE fix). Safe to run concurrently with training: it touches
only completed folds' files and never the TPU.

Usage: python scripts_dev/score_partial.py [out_json]
Env:   PROXY_ROOT (default /tmp/luna_proxy), PROXY_MODEL_NAME
"""
import importlib.util
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# keep this process off the chip: the evaluator stack is numpy/C++, but a
# stray jnp call must land on CPU, not steal the training chip
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # noqa: BLE001
    pass


def main():
    root = Path(os.environ.get("PROXY_ROOT", "/tmp/luna_proxy"))
    model_name = os.environ.get("PROXY_MODEL_NAME", "RetinaUNetV001")
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = Path(
        positional[0] if positional
        else REPO / "artifacts" / "luna_proxy_partial_cpm.json"
    )
    task = root / "Task916_LunaProxy"
    model_dir = root / "models" / task.name / model_name

    from nndetection_tpu.pipeline import materialize_val_predictions, run_evaluate
    from nndetection_tpu.utils.io import load_pickle, save_json

    spec = importlib.util.spec_from_file_location(
        "task016_prepare", REPO / "projects" / "Task016_Luna" / "prepare.py"
    )
    task016 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(task016)

    # --allow-incomplete: also score folds whose sweep was truncated by the
    # wall clock (ensembler states exist but no swept plan_inference.pkl —
    # default postprocessing parameters are used, and ONLY the predicted
    # cases are scored, explicitly labeled as a subset)
    allow_incomplete = "--allow-incomplete" in sys.argv
    folds = sorted(
        int(p.parent.name[len("fold"):])
        for p in model_dir.glob("fold*/plan_inference.pkl")
    )
    incomplete = []
    if allow_incomplete:
        incomplete = sorted(
            int(p.parent.name[len("fold"):])
            for p in model_dir.glob("fold*/sweep")
            if any(p.glob("*_boxes_state.pkl"))
            and int(p.parent.name[len("fold"):]) not in folds
        )
        folds = sorted(folds + incomplete)
    if not folds:
        print("no completed folds (no fold*/plan_inference.pkl) — nothing to score")
        return 1
    print(f"scoring folds: {folds} (incomplete sweeps: {incomplete})")

    t0 = time.time()
    for fold in folds:
        fold_dir = model_dir / f"fold{fold}"
        out = fold_dir / "val_predictions"
        n_states = len(list((fold_dir / "sweep").glob("*_boxes_state.pkl")))
        existing = list(out.glob("*_boxes.pkl"))
        # staleness guard (round-4 ADVICE): predictions materialized under
        # DEFAULT params before the fold's swept plan_inference.pkl landed
        # must be refreshed, or the pooled artifact silently mixes
        # default-param and swept-param predictions across runs.
        plan_inf = fold_dir / "plan_inference.pkl"
        stale = (
            plan_inf.exists()
            and existing
            and min(p.stat().st_mtime for p in existing) < plan_inf.stat().st_mtime
        )
        if len(existing) >= n_states and n_states > 0 and not stale:
            print(f"fold {fold}: val predictions already materialized")
            continue
        materialize_val_predictions(task, model_dir, fold)
        print(f"fold {fold}: materialized val predictions (stale={stale})")

    import shutil

    pooled = model_dir / "cv_predictions_partial"
    pooled.mkdir(exist_ok=True)
    for fold in folds:
        for p in (model_dir / f"fold{fold}" / "val_predictions").glob("*_boxes.pkl"):
            dst = pooled / p.name
            # copy when absent OR when the fold's materialized prediction is
            # newer than the pooled copy (refresh after a re-sweep)
            if not dst.exists() or p.stat().st_mtime > dst.stat().st_mtime:
                shutil.copy(p, dst)

    cpm_csv = model_dir / "cpm_predictions_partial.csv"
    task016.export_cpm(pooled, task / "raw_splitted" / "labelsTr", cpm_csv)
    splits = load_pickle(task / "preprocessed" / "splits_final.pkl")
    predicted = {
        p.name[: -len("_boxes.pkl")]
        for p in pooled.glob("*_boxes.pkl")
        if p.name != "results_boxes.pkl"
    }
    # complete folds: the FULL val split — a missing case scores as all-miss
    # (round-3 ADVICE fix). Incomplete (wall-clock-truncated) folds: only the
    # predicted subset — the prefix of the case list the sweep got through,
    # not a quality-selected sample — labeled as such in the artifact.
    series = sorted(
        {cid for f in folds if f not in incomplete for cid in splits[f]["val"]}
        | {cid for f in incomplete for cid in splits[f]["val"] if cid in predicted}
    )
    missing = sorted(set(series) - predicted)
    if missing:
        print(f"WARNING: {len(missing)} val cases missing (scored all-miss): {missing[:5]}")
    cpm = task016.score_cpm(cpm_csv, root / "raw" / "annotations.csv", series=series)
    print(f"CPM={cpm['cpm']:.4f} FROC={cpm['froc']}")

    # run_evaluate scores exactly the *_boxes.pkl present in pred_dir — the
    # pooled partial dir holds only the completed folds' val cases
    box_metrics, _ = run_evaluate(task, pooled, split="Tr")
    ap_keys = {
        k: round(float(v), 4)
        for k, v in box_metrics.items()
        if isinstance(v, (int, float)) and ("AP" in k or "FROC" in k)
    }
    print(f"box eval mAP={box_metrics.get('mAP_IoU_0.10_0.50_0.05_MaxDet_100')}")

    # per-fold training history snapshot for convergence evidence
    hists = {}
    for fold in folds:
        hp = model_dir / f"fold{fold}" / "train_history.jsonl"
        if hp.exists():
            hists[fold] = [json.loads(l) for l in hp.read_text().splitlines()]

    save_json(
        {
            "folds_scored": folds,
            "incomplete_sweep_folds": incomplete,
            "num_val_scans": len(series),
            "cpm": cpm,
            "box_eval": ap_keys,
            "fold_histories": hists,
            "score_time_s": round(time.time() - t0, 1),
            "reference_bar": {
                "luna16_cpm_10fold": 0.930,
                "note": "real LUNA16 blocked in env; synthetic proxy, "
                "completed-fold subset of the 5-fold CV",
            },
        },
        out_json,
    )
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
