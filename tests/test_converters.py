import json

import numpy as np
import pytest

from nndetection_tpu.cli.convert import cls2fg, seg2det
from nndetection_tpu.cli.nnunet_interop import export_to_nnunet, nnunet_seg_to_boxes
from nndetection_tpu.data import nifti
from nndetection_tpu.data.dataset import discover_cases
from nndetection_tpu.utils.io import load_json, load_pickle, save_json, save_yaml


def make_semantic_task(tmp_path, rng):
    task = tmp_path / "TaskSem"
    (task / "raw_splitted" / "imagesTr").mkdir(parents=True)
    (task / "raw_splitted" / "labelsTr").mkdir(parents=True)
    save_yaml(
        {"task": "TaskSem", "dim": 3, "labels": {"1": "a", "2": "b"},
         "modalities": {"0": "CT"}},
        task / "dataset.yaml",
    )
    img = rng.rand(16, 16, 16).astype(np.float32)
    seg = np.zeros((16, 16, 16), np.int16)
    seg[2:5, 2:5, 2:5] = 1
    seg[8:11, 8:11, 8:11] = 1
    seg[12:14, 12:14, 12:14] = 2
    nifti.save(task / "raw_splitted" / "imagesTr" / "c1_0000.nii.gz", img)
    nifti.save(task / "raw_splitted" / "labelsTr" / "c1.nii.gz", seg)
    return task


def make_instance_task(tmp_path, rng):
    task = tmp_path / "TaskInst"
    (task / "raw_splitted" / "imagesTr").mkdir(parents=True)
    (task / "raw_splitted" / "labelsTr").mkdir(parents=True)
    save_yaml(
        {"task": "TaskInst", "dim": 3, "labels": {"0": "a", "1": "b"},
         "modalities": {"0": "CT"}},
        task / "dataset.yaml",
    )
    img = rng.rand(12, 12, 12).astype(np.float32)
    seg = np.zeros((12, 12, 12), np.int16)
    seg[1:4, 1:4, 1:4] = 1
    seg[6:9, 6:9, 6:9] = 2
    nifti.save(task / "raw_splitted" / "imagesTr" / "c1_0000.nii.gz", img)
    nifti.save(task / "raw_splitted" / "labelsTr" / "c1.nii.gz", seg)
    save_json({"instances": {"1": 0, "2": 1}},
              task / "raw_splitted" / "labelsTr" / "c1.json")
    return task


class TestSeg2Det:
    def test_components_become_instances(self, tmp_path, rng):
        task = make_semantic_task(tmp_path, rng)
        out = tmp_path / "TaskDet"
        seg2det(task, out)
        cases = discover_cases(
            out / "raw_splitted" / "imagesTr", out / "raw_splitted" / "labelsTr"
        )
        assert len(cases) == 1
        inst = cases[0].instances()
        assert len(inst) == 3  # two class-1 components + one class-2
        assert sorted(inst.values()) == [0, 0, 1]


class TestCls2Fg:
    def test_classes_collapsed(self, tmp_path, rng):
        task = make_instance_task(tmp_path, rng)
        out = tmp_path / "TaskFg"
        cls2fg(task, out)
        cases = discover_cases(
            out / "raw_splitted" / "imagesTr", out / "raw_splitted" / "labelsTr"
        )
        inst = cases[0].instances()
        assert set(inst.values()) == {0}
        meta = load_json(out / "raw_splitted" / "labelsTr" / "c1.json")
        assert meta["original_classes"] == {"1": 0, "2": 1}


class TestNNUNetInterop:
    def test_export(self, tmp_path, rng):
        task = make_instance_task(tmp_path, rng)
        out = tmp_path / "nnunet"
        export_to_nnunet(task, out)
        with open(out / "dataset.json") as f:
            meta = json.load(f)
        assert meta["numTraining"] == 1
        sem, _, _ = nifti.load(out / "labelsTr" / "c1.nii.gz")
        assert set(np.unique(sem)) == {0, 1, 2}

    def test_boxes_from_seg(self, tmp_path, rng):
        pred = tmp_path / "preds"
        pred.mkdir()
        seg = np.zeros((12, 12, 12), np.int16)
        seg[2:5, 2:5, 2:5] = 1
        nifti.save(pred / "c1.nii.gz", seg)
        out = tmp_path / "boxes"
        nnunet_seg_to_boxes(pred, out)
        p = load_pickle(out / "c1_boxes.pkl")
        assert len(p["pred_boxes"]) == 1
        np.testing.assert_allclose(p["pred_boxes"][0], [2, 2, 5, 5, 2, 5])
        assert p["pred_labels"][0] == 0
