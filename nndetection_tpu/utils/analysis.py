"""Post-hoc analysis suite over a prediction directory
(``/root/reference/nndet/utils/analysis.py:370-443``): prediction/GT joins at
IoU/score grids, confusion matrices, object-size statistics, and matplotlib
plots (FROC curves, score histograms, size scatter).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from nndetection_tpu.core.boxes.ops_np import box_iou_np, box_size_np
from nndetection_tpu.utils.io import load_pickle, save_json


def analyze_case(
    pred: Dict[str, np.ndarray],
    gt_boxes: np.ndarray,
    gt_classes: np.ndarray,
    iou_thresh: float = 0.1,
    score_thresh: float = 0.5,
) -> Dict:
    """Greedy-join predictions and GT; classify into TP/FP/FN with sizes."""
    pb = np.asarray(pred["pred_boxes"])
    ps = np.asarray(pred["pred_scores"])
    pl = np.asarray(pred["pred_labels"])
    keep = ps >= score_thresh
    pb, ps, pl = pb[keep], ps[keep], pl[keep]

    matched_gt = np.full(len(gt_boxes), -1)
    matched_pred = np.full(len(pb), -1)
    if len(pb) and len(gt_boxes):
        ious = box_iou_np(pb, gt_boxes)
        for i in np.argsort(-ps, kind="stable"):
            j = int(np.argmax(ious[i]))
            if ious[i, j] >= iou_thresh and matched_gt[j] == -1:
                matched_gt[j] = i
                matched_pred[i] = j
    tp = int((matched_pred >= 0).sum())
    fp = int((matched_pred == -1).sum())
    fn = int((matched_gt == -1).sum())
    # label confusion among matched pairs
    confusion = []
    for i, j in enumerate(matched_pred):
        if j >= 0:
            confusion.append((int(pl[i]), int(gt_classes[j])))
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "confusion_pairs": confusion,
        "fn_sizes": box_size_np(gt_boxes[matched_gt == -1]).tolist()
        if fn
        else [],
        "tp_scores": ps[matched_pred >= 0].tolist(),
        "fp_scores": ps[matched_pred == -1].tolist(),
    }


def run_analysis_suite(
    pred_dir,
    gt_dir,
    save_dir,
    num_classes: int = 1,
    iou_thresh: float = 0.1,
    score_threshs: Sequence[float] = (0.1, 0.3, 0.5),
    make_plots: bool = True,
) -> Dict:
    pred_dir, gt_dir, save_dir = Path(pred_dir), Path(gt_dir), Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    summary: Dict = {}
    for st in score_threshs:
        agg = {"tp": 0, "fp": 0, "fn": 0}
        confusion = np.zeros((num_classes, num_classes), dtype=int)
        fn_sizes: List = []
        tp_scores: List = []
        fp_scores: List = []
        for p in sorted(pred_dir.glob("*_boxes.pkl")):
            cid = p.name[: -len("_boxes.pkl")]
            pred = load_pickle(p)
            with np.load(gt_dir / f"{cid}_boxes_gt.npz") as f:
                res = analyze_case(
                    pred, f["boxes"], f["classes"], iou_thresh, st
                )
            for k in ("tp", "fp", "fn"):
                agg[k] += res[k]
            for pc, gc in res["confusion_pairs"]:
                if pc < num_classes and gc < num_classes:
                    confusion[gc, pc] += 1
            fn_sizes.extend(res["fn_sizes"])
            tp_scores.extend(res["tp_scores"])
            fp_scores.extend(res["fp_scores"])
        summary[f"score_{st:.2f}"] = {
            **agg,
            "precision": agg["tp"] / max(agg["tp"] + agg["fp"], 1),
            "recall": agg["tp"] / max(agg["tp"] + agg["fn"], 1),
            "confusion": confusion.tolist(),
            "num_missed": len(fn_sizes),
        }
        if make_plots:
            _plot_hists(tp_scores, fp_scores, fn_sizes, save_dir, st)
    save_json(summary, save_dir / "analysis.json")
    return summary


def plot_froc_curves(curves: Dict, save_path) -> None:
    """Plot FROC curves from the evaluator's curve dict
    (``FROC_curve_IoU_*`` + ``FROC_fpi_thresholds``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001
        return
    fpi = curves.get("FROC_fpi_thresholds")
    if fpi is None:
        return
    fig, ax = plt.subplots(figsize=(6, 4))
    for k, v in curves.items():
        if k.startswith("FROC_curve_IoU_"):
            ax.plot(fpi, v, marker="o", label=k.replace("FROC_curve_", ""))
    ax.set_xscale("log", base=2)
    ax.set_xlabel("false positives per image")
    ax.set_ylabel("sensitivity")
    ax.set_ylim(0, 1.02)
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def _plot_hists(tp_scores, fp_scores, fn_sizes, save_dir: Path, score_thresh: float):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001
        return
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(
        [tp_scores, fp_scores], bins=20, label=["TP", "FP"], stacked=False
    )
    axes[0].set_title(f"scores (thr={score_thresh})")
    axes[0].legend()
    if fn_sizes:
        sizes = np.asarray(fn_sizes)
        axes[1].hist(sizes.max(axis=1), bins=20)
    axes[1].set_title("missed-object max extent")
    fig.tight_layout()
    fig.savefig(save_dir / f"analysis_scores_{score_thresh:.2f}.png", dpi=100)
    plt.close(fig)
