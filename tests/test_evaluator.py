import numpy as np
import pytest

from nndetection_tpu.evaluator import BoxEvaluator, COCOMetric, FROCMetric, matching_batch


def box3(x, size=10):
    return [x, x, x + size, x + size, x, x + size]


class TestMatching:
    def test_perfect_match(self):
        gt = np.asarray([box3(0), box3(50)], np.float64)
        preds = gt.copy()
        res = matching_batch(
            iou_thresholds=[0.5],
            pred_boxes=[preds],
            pred_classes=[np.zeros(2)],
            pred_scores=[np.asarray([0.9, 0.8])],
            gt_boxes=[gt],
            gt_classes=[np.zeros(2)],
        )
        m = res[0][0]
        assert m["dtMatches"].sum() == 2
        assert m["gtMatches"].sum() == 2

    def test_greedy_highest_score_first(self):
        gt = np.asarray([box3(0)], np.float64)
        # two overlapping predictions; higher score claims the gt
        preds = np.asarray([box3(0), box3(1)], np.float64)
        res = matching_batch(
            iou_thresholds=[0.1],
            pred_boxes=[preds],
            pred_classes=[np.zeros(2)],
            pred_scores=[np.asarray([0.3, 0.9])],
            gt_boxes=[gt],
            gt_classes=[np.zeros(1)],
        )
        m = res[0][0]
        # sorted by score desc: idx0 = the 0.9 box (shifted), matches; other FP
        assert m["dtMatches"][0].tolist() == [1.0, 0.0]

    def test_ignore_gt(self):
        gt = np.asarray([box3(0)], np.float64)
        preds = np.asarray([box3(0)], np.float64)
        res = matching_batch(
            iou_thresholds=[0.5],
            pred_boxes=[preds],
            pred_classes=[np.zeros(1)],
            pred_scores=[np.asarray([0.9])],
            gt_boxes=[gt],
            gt_classes=[np.zeros(1)],
            gt_ignore=[np.asarray([True])],
        )
        m = res[0][0]
        assert m["dtIgnore"][0, 0] == 1  # matched to ignored gt

    def test_class_separation(self):
        gt = np.asarray([box3(0)], np.float64)
        preds = np.asarray([box3(0)], np.float64)
        res = matching_batch(
            iou_thresholds=[0.5],
            pred_boxes=[preds],
            pred_classes=[np.ones(1)],  # wrong class
            pred_scores=[np.asarray([0.9])],
            gt_boxes=[gt],
            gt_classes=[np.zeros(1)],
        )
        assert res[0][0]["dtMatches"].size == 0  # no preds for class 0
        assert res[0][1]["dtMatches"][0, 0] == 0  # pred is FP for class 1


class TestCOCO:
    def _results(self, n_img=4, perfect=True, rng=None):
        evaluator = BoxEvaluator.create(["lesion"], fast=True)
        for i in range(n_img):
            gt = np.asarray([box3(0), box3(40)], np.float64)
            if perfect:
                preds, scores = gt.copy(), np.asarray([0.9, 0.8])
            else:
                preds = np.asarray([box3(100)], np.float64)
                scores = np.asarray([0.9])
            evaluator.add_batch(
                pred_boxes=[preds],
                pred_scores=[scores],
                pred_labels=[np.zeros(len(preds))],
                gt_boxes=[gt],
                gt_classes=[np.zeros(2)],
            )
        return evaluator.finish_online_evaluation()

    def test_perfect_ap_one(self):
        scores, _ = self._results(perfect=True)
        assert scores["mAP_IoU_0.10_0.50_0.05_MaxDet_100"] == pytest.approx(1.0)
        assert scores["AP_IoU_0.10_MaxDet_100"] == pytest.approx(1.0)

    def test_all_wrong_ap_zero(self):
        scores, _ = self._results(perfect=False)
        assert scores["mAP_IoU_0.10_0.50_0.05_MaxDet_100"] == pytest.approx(0.0)

    def test_half_recall(self):
        evaluator = BoxEvaluator.create(["lesion"], fast=True)
        gt = np.asarray([box3(0), box3(40)], np.float64)
        preds = np.asarray([box3(0)], np.float64)  # finds one of two
        evaluator.add_batch(
            pred_boxes=[preds],
            pred_scores=[np.asarray([0.9])],
            pred_labels=[np.zeros(1)],
            gt_boxes=[gt],
            gt_classes=[np.zeros(2)],
        )
        scores, _ = evaluator.finish_online_evaluation()
        # AP = precision 1.0 up to recall 0.5, 0 after -> ~0.5 (101 pt)
        ap = scores["AP_IoU_0.10_MaxDet_100"]
        assert 0.45 < ap < 0.55


class TestFROC:
    def test_perfect_cpm_one(self):
        m = FROCMetric(["lesion"], iou_thresholds=(0.1,))
        gt = np.asarray([box3(0)], np.float64)
        results = matching_batch(
            iou_thresholds=[0.1],
            pred_boxes=[gt.copy()] * 8,
            pred_classes=[np.zeros(1)] * 8,
            pred_scores=[np.asarray([0.9])] * 8,
            gt_boxes=[gt] * 8,
            gt_classes=[np.zeros(1)] * 8,
        )
        scores, curves = m.compute(results)
        assert scores["FROC_score_IoU_0.10"] == pytest.approx(1.0)

    def test_fp_only_zero(self):
        m = FROCMetric(["lesion"], iou_thresholds=(0.1,))
        gt = np.asarray([box3(0)], np.float64)
        fp = np.asarray([box3(100)], np.float64)
        results = matching_batch(
            iou_thresholds=[0.1],
            pred_boxes=[fp] * 4,
            pred_classes=[np.zeros(1)] * 4,
            pred_scores=[np.asarray([0.9])] * 4,
            gt_boxes=[gt] * 4,
            gt_classes=[np.zeros(1)] * 4,
        )
        scores, _ = m.compute(results)
        assert scores["FROC_score_IoU_0.10"] == pytest.approx(0.0)

    def test_mixed_sensitivity(self):
        m = FROCMetric(["lesion"], iou_thresholds=(0.1,))
        # 4 images: 1 gt each; 2 found + per-image 1 FP at lower score
        gt = np.asarray([box3(0)], np.float64)
        fp = np.asarray([box3(100)], np.float64)
        pred_found = np.concatenate([gt, fp])
        results = matching_batch(
            iou_thresholds=[0.1],
            pred_boxes=[pred_found, pred_found, fp, fp],
            pred_classes=[np.zeros(2), np.zeros(2), np.zeros(1), np.zeros(1)],
            pred_scores=[
                np.asarray([0.9, 0.3]),
                np.asarray([0.9, 0.3]),
                np.asarray([0.3]),
                np.asarray([0.3]),
            ],
            gt_boxes=[gt] * 4,
            gt_classes=[np.zeros(1)] * 4,
        )
        scores, curves = m.compute(results)
        # at 1 FP/image the sensitivity is 0.5 (2 of 4 found)
        assert 0 < scores["FROC_score_IoU_0.10"] <= 0.5


def test_evaluate_box_dir_ignores_results_artifact(tmp_path):
    """Re-evaluating a directory that already holds the saved metrics artifact
    (results_boxes.pkl) must not treat it as a case prediction."""
    import numpy as np

    from nndetection_tpu.evaluator.registry import evaluate_box_dir
    from nndetection_tpu.utils.io import save_pickle

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(); gt.mkdir()
    save_pickle(
        {"pred_boxes": np.asarray([[1, 1, 5, 5, 1, 5]], np.float32),
         "pred_scores": np.asarray([0.9], np.float32),
         "pred_labels": np.asarray([0], np.int64)},
        pred / "case0_boxes.pkl",
    )
    np.savez(gt / "case0_boxes_gt.npz",
             boxes=np.asarray([[1, 1, 5, 5, 1, 5]], np.float32),
             classes=np.asarray([0], np.int64))
    # first evaluation writes results_boxes.pkl into pred
    s1, _ = evaluate_box_dir(pred, gt, ["c0"], save_dir=pred, fast=True)
    assert (pred / "results_boxes.pkl").exists()
    # second evaluation must produce identical scores, not crash on the artifact
    s2, _ = evaluate_box_dir(pred, gt, ["c0"], save_dir=pred, fast=True)
    assert s1 == s2


def test_evaluate_case_dir(tmp_path):
    """Patient-level dir runner: case with a correct high-score detection vs
    an empty-GT case with a low-score FP -> separable -> AUROC 1."""
    import numpy as np

    from nndetection_tpu.evaluator.registry import evaluate_case_dir
    from nndetection_tpu.utils.io import save_pickle

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(); gt.mkdir()
    save_pickle(
        {"pred_boxes": np.asarray([[1, 1, 5, 5, 1, 5]], np.float32),
         "pred_scores": np.asarray([0.9], np.float32),
         "pred_labels": np.asarray([0], np.int64)},
        pred / "case0_boxes.pkl",
    )
    np.savez(gt / "case0_boxes_gt.npz",
             boxes=np.asarray([[1, 1, 5, 5, 1, 5]], np.float32),
             classes=np.asarray([0], np.int64))
    save_pickle(
        {"pred_boxes": np.asarray([[2, 2, 6, 6, 2, 6]], np.float32),
         "pred_scores": np.asarray([0.1], np.float32),
         "pred_labels": np.asarray([0], np.int64)},
        pred / "case1_boxes.pkl",
    )
    np.savez(gt / "case1_boxes_gt.npz",
             boxes=np.zeros((0, 6), np.float32),
             classes=np.zeros((0,), np.int64))
    scores = evaluate_case_dir(pred, gt, ["c0"], save_dir=pred)
    assert scores["case_auroc"] == 1.0
    assert (pred / "results_case.json").exists()


def test_analysis_suite_overview_csv(tmp_path):
    """The per-case overview CSV joins pred/gt counts per case."""
    import csv

    import numpy as np

    from nndetection_tpu.utils.analysis import run_analysis_suite
    from nndetection_tpu.utils.io import save_pickle

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(); gt.mkdir()
    save_pickle(
        {"pred_boxes": np.asarray([[1, 1, 5, 5, 1, 5], [20, 20, 24, 24, 20, 24]],
                                  np.float32),
         "pred_scores": np.asarray([0.9, 0.3], np.float32),
         "pred_labels": np.asarray([0, 0], np.int64)},
        pred / "case0_boxes.pkl",
    )
    np.savez(gt / "case0_boxes_gt.npz",
             boxes=np.asarray([[1, 1, 5, 5, 1, 5]], np.float32),
             classes=np.asarray([0], np.int64))
    run_analysis_suite(pred, gt, tmp_path / "analysis", num_classes=1,
                       iou_threshs=(0.1,), score_threshs=(0.5,),
                       make_plots=False)
    csv_path = tmp_path / "analysis" / "iou_0.1_score_0.5" / "overview.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["case_id"] == "case0"
    assert rows[0]["num_gt"] == "1"
    assert rows[0]["num_pred"] == "2"
    assert rows[0]["num_pred_kept"] == "1"  # score 0.3 below thresh 0.5
    assert rows[0]["tp"] == "1" and rows[0]["fp"] == "0"
