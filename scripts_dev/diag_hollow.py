"""Diagnose the hollow-square IoU@0.5 gap: per-GT best-IoU distribution and
score-ranking structure on the toy test predictions."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from pathlib import Path
from nndetection_tpu.utils.io import load_pickle
from nndetection_tpu.core.boxes.ops_np import box_iou_np

task = Path("/tmp/toy_full/Task000D3_Example")
pred_dir = task.parent.parent / "toy_full" / "models" / task.name / "RetinaUNetV001_D3V001_3d" / "test_predictions"
gt_dir = task / "preprocessed" / "D3V001_3d" / "labelsTs"
rows = []
for p in sorted(pred_dir.glob("*_boxes.pkl")):
    if p.name == "results_boxes.pkl": continue
    cid = p.name[:-len("_boxes.pkl")]
    pred = load_pickle(p)
    gt = np.load(gt_dir / f"{cid}_boxes_gt_orig.npz")
    pb, ps, pl = np.asarray(pred["pred_boxes"]), np.asarray(pred["pred_scores"]), np.asarray(pred["pred_labels"])
    gb, gc = gt["boxes"], gt["classes"]
    for gi in range(len(gb)):
        cls = int(gc[gi])
        m = pl == cls
        if m.sum() == 0:
            rows.append((cid, cls, 0.0, -1, 0.0)); continue
        ious = box_iou_np(gb[gi:gi+1], pb[m])[0]
        bi = int(np.argmax(ious))
        rows.append((cid, cls, float(ious[bi]), bi, float(ps[m][bi])))
    # false positives above best scores
print(f"{'case':28s} cls bestIoU rank score")
for r in rows:
    print(f"{r[0]:28s} {r[1]}   {r[2]:.3f}  {r[3]:3d}  {r[4]:.3f}")
arr = np.array([r[2] for r in rows if r[1] == 1])
arr0 = np.array([r[2] for r in rows if r[1] == 0])
print("square   best-IoU mean/min:", arr0.mean().round(3), arr0.min().round(3))
print("hollow   best-IoU mean/min:", arr.mean().round(3), arr.min().round(3))
# per-case top-5 predictions for one weak case
