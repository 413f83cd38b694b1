"""Randomized brute-force cross-check of the COCO AP stack (VERDICT r3 #10).

An independent, literal O(N^2) implementation of greedy matching + 101-point
interpolated AP is compared against ``matching_batch`` + ``COCOMetric`` on
random instances — the same discipline the CPM scorer got in round 3
(``tests/test_luna_proxy.py``). Any divergence in matching order, precision
envelope, or recall interpolation shows up as an AP mismatch.
"""
import numpy as np
import pytest

from nndetection_tpu.core.boxes.ops_np import box_iou_np
from nndetection_tpu.evaluator import COCOMetric, matching_batch


def naive_ap(pred_by_img, gt_by_img, iou_t, num_recall=101):
    """Literal COCO AP for one class at one IoU threshold.

    pred_by_img: list of (boxes [N,6], scores [N]); gt_by_img: list of boxes.
    """
    flags = []  # (score, is_tp)
    num_gt = 0
    for (pb, ps), gb in zip(pred_by_img, gt_by_img):
        num_gt += len(gb)
        order = np.argsort(-ps, kind="stable")
        taken = np.zeros(len(gb), bool)
        iou = box_iou_np(pb, gb) if len(pb) and len(gb) else np.zeros((len(pb), len(gb)))
        for di in order:
            best, best_iou = -1, iou_t
            for gi in range(len(gb)):
                if taken[gi]:
                    continue
                if iou[di, gi] >= best_iou:
                    best, best_iou = gi, iou[di, gi]
            if best >= 0:
                taken[best] = True
                flags.append((ps[di], 1))
            else:
                flags.append((ps[di], 0))
    if num_gt == 0:
        return -1.0
    if not flags:
        return 0.0
    flags.sort(key=lambda t: -t[0])
    tp = np.cumsum([f[1] for f in flags])
    fp = np.cumsum([1 - f[1] for f in flags])
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # interpolated precision: max precision at any recall >= r
    ap = 0.0
    for r in np.linspace(0, 1, num_recall):
        mask = recall >= r
        ap += float(precision[mask].max()) if mask.any() else 0.0
    return ap / num_recall


def random_scene(rng, num_images=6, max_gt=4, max_fp=5):
    """Random 3D instances: GT boxes + jittered TP candidates + FPs."""
    preds, gts = [], []
    for _ in range(num_images):
        n_gt = rng.randint(0, max_gt + 1)
        gb = []
        for _ in range(n_gt):
            c = rng.uniform(10, 90, size=3)
            s = rng.uniform(4, 16, size=3)
            gb.append([c[0] - s[0], c[1] - s[1], c[0] + s[0], c[1] + s[1],
                       c[2] - s[2], c[2] + s[2]])
        gb = np.asarray(gb, np.float64).reshape(-1, 6)
        pb = []
        for g in gb:
            if rng.rand() < 0.85:  # jittered detection
                jitter = rng.uniform(-3, 3, size=6)
                pb.append(g + jitter)
        for _ in range(rng.randint(0, max_fp + 1)):
            c = rng.uniform(10, 90, size=3)
            s = rng.uniform(3, 12, size=3)
            pb.append([c[0] - s[0], c[1] - s[1], c[0] + s[0], c[1] + s[1],
                       c[2] - s[2], c[2] + s[2]])
        pb = np.asarray(pb, np.float64).reshape(-1, 6)
        scores = rng.rand(len(pb))
        preds.append((pb, scores))
        gts.append(gb)
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_coco_ap_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    preds, gts = random_scene(rng)
    ious = [0.1, 0.25, 0.5]
    metric = COCOMetric(
        classes=["c0"], iou_list=ious, iou_range=(0.1, 0.5, 0.2),
        per_class=False,
    )
    results = matching_batch(
        iou_thresholds=metric.get_iou_thresholds(),
        pred_boxes=[p for p, _ in preds],
        pred_classes=[np.zeros(len(p)) for p, _ in preds],
        pred_scores=[s for _, s in preds],
        gt_boxes=gts,
        gt_classes=[np.zeros(len(g)) for g in gts],
    )
    scores, _ = metric.compute(results)
    for t in ious:
        expected = naive_ap(preds, gts, t)
        got = scores[f"AP_IoU_{t:.2f}_MaxDet_100"]
        assert got == pytest.approx(expected, abs=1e-9), (
            f"iou={t}: COCOMetric={got} brute_force={expected}"
        )


def test_coco_ap_two_classes_independent():
    """Per-class APs must equal single-class APs computed separately."""
    rng = np.random.RandomState(11)
    preds_a, gts_a = random_scene(rng, num_images=4)
    preds_b, gts_b = random_scene(rng, num_images=4)
    pred_boxes = [np.concatenate([pa, pb]) for (pa, _), (pb, _) in zip(preds_a, preds_b)]
    pred_scores = [np.concatenate([sa, sb]) for (_, sa), (_, sb) in zip(preds_a, preds_b)]
    pred_classes = [
        np.concatenate([np.zeros(len(pa)), np.ones(len(pb))])
        for (pa, _), (pb, _) in zip(preds_a, preds_b)
    ]
    gt_boxes = [np.concatenate([ga, gb]) for ga, gb in zip(gts_a, gts_b)]
    gt_classes = [
        np.concatenate([np.zeros(len(ga)), np.ones(len(gb))])
        for ga, gb in zip(gts_a, gts_b)
    ]
    metric = COCOMetric(
        classes=["a", "b"], iou_list=[0.25], iou_range=(0.1, 0.5, 0.2),
        per_class=True,
    )
    results = matching_batch(
        iou_thresholds=metric.get_iou_thresholds(),
        pred_boxes=pred_boxes,
        pred_classes=pred_classes,
        pred_scores=pred_scores,
        gt_boxes=gt_boxes,
        gt_classes=gt_classes,
    )
    scores, _ = metric.compute(results)
    assert scores["a_AP_IoU_0.25_MaxDet_100"] == pytest.approx(
        naive_ap(preds_a, gts_a, 0.25), abs=1e-9
    )
    assert scores["b_AP_IoU_0.25_MaxDet_100"] == pytest.approx(
        naive_ap(preds_b, gts_b, 0.25), abs=1e-9
    )
