"""Collect real-data inference timings from the LUNA-proxy sweep predictions.

The per-fold postprocessing sweep runs the FULL deployment inference path
(sliding-window tiling + fused on-device 8-way mirror TTA + device WBC
ensembling) once per val case and stores ``prediction_time_s`` in each
``sweep/*_boxes.pkl`` (``nndetection_tpu/pipeline.py::predict_dir``). This
turns those into the round's measured volumes/min artifact on REAL plan
geometry (125-case proxy, patch [40,96,96], ~(118,219,219) volumes) —
complementing the synthetic-shape ``bench.py --mode infer`` point
(reference stack: ``/root/reference/nndet/inference/predictor.py:39-341``).

Usage: python scripts_dev/collect_infer_times.py [out_json]
"""
import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main():
    root = Path(os.environ.get("PROXY_ROOT", "/tmp/luna_proxy"))
    model_name = os.environ.get("PROXY_MODEL_NAME", "RetinaUNetV001")
    out_json = Path(
        sys.argv[1] if len(sys.argv) > 1
        else REPO / "artifacts" / "infer_times_proxy_r04.json"
    )
    model_dir = root / "models" / "Task916_LunaProxy" / model_name
    prep_images = (
        root / "Task916_LunaProxy" / "preprocessed" / "D3V001_3d" / "imagesTr"
    )

    rows = []
    for pkl in sorted(model_dir.glob("fold*/sweep/*_boxes.pkl")):
        cid = pkl.name[: -len("_boxes.pkl")]
        with open(pkl, "rb") as f:
            d = pickle.load(f)
        t = d.get("prediction_time_s")
        if t is None:
            continue
        shape = None
        npy = prep_images / f"{cid}.npy"
        npz = prep_images / f"{cid}.npz"
        if npy.exists():
            shape = list(np.load(npy, mmap_mode="r").shape)
        elif npz.exists():
            with np.load(npz) as z:
                shape = list(z["data"].shape)
        rows.append(
            {"case": cid, "fold": pkl.parent.parent.name,
             "prediction_time_s": round(float(t), 3), "shape": shape}
        )
    if not rows:
        print("no sweep predictions with timings found")
        return 1

    times = np.asarray([r["prediction_time_s"] for r in rows])
    # The first case predicted per fold pays the tile-batch compile. Identify
    # compile-paying cases POSITIONALLY (earliest mtime per fold, i.e. first
    # in prediction order) rather than dropping the N slowest — the slowest
    # timings may simply be the largest volumes (round-4 ADVICE fix).
    first_per_fold = set()
    by_fold = {}
    for pkl in sorted(model_dir.glob("fold*/sweep/*_boxes.pkl")):
        fold = pkl.parent.parent.name
        m = pkl.stat().st_mtime
        if fold not in by_fold or m < by_fold[fold][0]:
            by_fold[fold] = (m, pkl.name[: -len("_boxes.pkl")])
    first_per_fold = {(fold, cid) for fold, (_, cid) in by_fold.items()}
    steady = np.asarray(
        [
            r["prediction_time_s"]
            for r in rows
            if (r["fold"], r["case"]) not in first_per_fold
        ]
    )
    if steady.size == 0:
        steady = times
    result = {
        "metric": "infer_volumes_per_min_tta",
        "value": round(60.0 / float(np.mean(times)), 3),
        "unit": "volumes/min (1 model x 8-way TTA, real proxy cases)",
        "num_cases": len(rows),
        "mean_s": round(float(np.mean(times)), 3),
        "median_s": round(float(np.median(times)), 3),
        "min_s": round(float(times.min()), 3),
        "max_s": round(float(times.max()), 3),
        "steady_volumes_per_min": round(60.0 / float(np.mean(steady)), 3),
        "cases": rows,
    }
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "cases"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
