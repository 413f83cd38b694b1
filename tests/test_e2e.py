"""End-to-end integration: toy dataset -> prep -> train -> sweep ->
consolidate -> predict -> evaluate (the reference's installation test,
``README.md:163-175``). Scaled down for CI; the full-scale run lives in
``bench.py`` / the CLI.
"""
from pathlib import Path

import numpy as np
import pytest

from nndetection_tpu.data.example import generate_example_dataset
from nndetection_tpu.pipeline import (
    run_consolidate,
    run_evaluate,
    run_predict_test,
    run_prep,
    run_sweep,
    run_train,
)
from nndetection_tpu.planning.planner import Planner
from nndetection_tpu.utils.io import load_pickle


@pytest.fixture(scope="module")
def task_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    return generate_example_dataset(
        root / "Task000D3_Example",
        num_train=3,
        num_test=2,
        image_size=(40, 40, 40),
        object_size=(8, 14),
        object_width=2,
    )


@pytest.fixture(scope="module")
def prepped(task_dir):
    plan = run_prep(task_dir, planner=Planner(anchor_budget=200))
    return task_dir, plan


TRAINER_TINY = dict(
    max_num_epochs=1,
    num_train_batches_per_epoch=6,
    num_val_batches_per_epoch=2,
    batch_size=2,
    warm_iterations=4,
    swa_epochs=1,
)
MODEL_TINY = dict(
    start_channels=8, fpn_channels=16, head_channels=16,
    topk_candidates=500, dtype="float32",
)


@pytest.fixture(scope="module")
def trained(prepped, tmp_path_factory):
    task_dir, plan = prepped
    model_dir = tmp_path_factory.mktemp("models") / "Task000D3_Example" / "RetinaUNetV001"
    logs = []
    # rename keys to TrainerConfig names
    tkw = dict(TRAINER_TINY)
    tkw["max_epochs"] = tkw.pop("max_num_epochs")
    run_train(
        task_dir,
        model_dir,
        fold=0,
        trainer_overrides=tkw,
        model_overrides=MODEL_TINY,
        log_fn=lambda e, m: logs.append((e, m)),
    )
    return task_dir, model_dir, logs


class TestPrep:
    def test_plan_written(self, prepped):
        task_dir, plan = prepped
        assert (task_dir / "preprocessed" / f"{plan.plan_id}.pkl").exists()
        assert plan.num_classes == 2
        assert len(plan.patch_size) == 3
        images = task_dir / "preprocessed" / plan.plan_id / "imagesTr"
        assert len(list(images.glob("*.npz"))) == 3
        assert len(list(images.glob("*_boxes.pkl"))) == 3
        labels = task_dir / "preprocessed" / plan.plan_id / "labelsTr"
        assert len(list(labels.glob("*_boxes_gt.npz"))) == 3

    def test_candidates_have_instance(self, prepped):
        task_dir, plan = prepped
        images = task_dir / "preprocessed" / plan.plan_id / "imagesTr"
        cand = load_pickle(sorted(images.glob("*_boxes.pkl"))[0])
        assert len(cand["boxes"]) == 1  # toy cases have exactly one instance


class TestTrain:
    def test_checkpoints_and_metrics(self, trained):
        task_dir, model_dir, logs = trained
        fold_dir = model_dir / "fold0"
        assert (fold_dir / "model_last.ckpt").exists()
        assert (fold_dir / "plan.pkl").exists()
        assert len(logs) == 2  # 1 train + 1 swa epoch
        epoch0 = logs[0][1]
        assert np.isfinite(epoch0["train_total"])
        assert "mAP_IoU_0.10_0.50_0.05_MaxDet_100" in epoch0

    def test_sweep_consolidate_predict_evaluate(self, trained):
        task_dir, model_dir, _ = trained
        plan_result = run_sweep(task_dir, model_dir, fold=0)
        assert "parameters" in plan_result
        assert (model_dir / "fold0" / "plan_inference.pkl").exists()

        out = run_consolidate(task_dir, model_dir, num_folds=1)
        assert (out / "model_fold0.ckpt").exists()
        assert (out / "plan_inference.pkl").exists()

        pred_dir = run_predict_test(task_dir, model_dir, num_folds=1)
        preds = sorted(pred_dir.glob("*_boxes.pkl"))
        assert len(preds) == 2
        p = load_pickle(preds[0])
        assert "pred_boxes" in p and "pred_scores" in p and "pred_labels" in p

        scores, _ = run_evaluate(task_dir, pred_dir)
        assert "mAP_IoU_0.10_0.50_0.05_MaxDet_100" in scores
        assert np.isfinite(scores["mAP_IoU_0.10_0.50_0.05_MaxDet_100"])

        # CV val predictions: the zero-device materialization from the
        # sweep's saved ensembler states must reproduce the re-prediction
        # path (same raw detections, same swept parameters, same restore)
        import shutil

        from nndetection_tpu.pipeline import (
            materialize_val_predictions,
            run_predict_val,
        )

        val_dir = run_predict_val(task_dir, model_dir, fold=0)
        ref_dir = val_dir.parent / "val_predictions_device"
        shutil.move(val_dir, ref_dir)
        mat_dir = materialize_val_predictions(task_dir, model_dir, fold=0)
        ref_files = sorted(ref_dir.glob("*_boxes.pkl"))
        mat_files = sorted(mat_dir.glob("*_boxes.pkl"))
        assert [p.name for p in mat_files] == [p.name for p in ref_files]
        for rf, mf in zip(ref_files, mat_files):
            ref, mat = load_pickle(rf), load_pickle(mf)
            assert ref["restored"] and mat["restored"]
            n = min(10, len(ref["pred_scores"]), len(mat["pred_scores"]))
            assert len(ref["pred_scores"]) == len(mat["pred_scores"])
            np.testing.assert_allclose(
                ref["pred_scores"][:n], mat["pred_scores"][:n], atol=1e-5
            )
            np.testing.assert_allclose(
                ref["pred_boxes"][:n], mat["pred_boxes"][:n], atol=1e-3
            )
            np.testing.assert_array_equal(
                ref["pred_labels"][:n], mat["pred_labels"][:n]
            )
