"""Dataset-check parity tests (reference ``nndet/utils/check.py:77-315``):
schema failures, raw_splitted inconsistencies, and the full-geometry tier
(mismatched spacing / origin / instances-json)."""
import json
from pathlib import Path

import numpy as np
import pytest

from nndetection_tpu.data import nifti
from nndetection_tpu.utils.check import (
    check_data_and_label_consistency,
    check_data_and_label_splitted,
    check_dataset_file,
)
from nndetection_tpu.utils.io import save_yaml


def make_task(tmp_path: Path, n_cases=2, spacing=(1.0, 1.0, 1.0)) -> Path:
    task = tmp_path / "Task900_Check"
    img_dir = task / "raw_splitted" / "imagesTr"
    lbl_dir = task / "raw_splitted" / "labelsTr"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    save_yaml(
        {
            "task": "Task900_Check",
            "dim": 3,
            "modalities": {0: "CT"},
            "labels": {0: "lesion"},
            "target_class": None,
        },
        task / "dataset.yaml",
    )
    rng = np.random.RandomState(0)
    for i in range(n_cases):
        cid = f"case_{i:03d}"
        img = rng.standard_normal((12, 16, 16)).astype(np.float32)
        seg = np.zeros((12, 16, 16), np.uint8)
        seg[4:8, 4:8, 4:8] = 1
        nifti.save(img_dir / f"{cid}_0000.nii.gz", img, spacing=np.asarray(spacing))
        nifti.save(lbl_dir / f"{cid}.nii.gz", seg, spacing=np.asarray(spacing))
        (lbl_dir / f"{cid}.json").write_text(json.dumps({"instances": {"1": 0}}))
    return task


class TestDatasetFileSchema:
    def test_valid(self, tmp_path):
        task = make_task(tmp_path)
        assert check_dataset_file(task) == []

    def test_missing_keys(self, tmp_path):
        task = make_task(tmp_path)
        save_yaml({"task": "x"}, task / "dataset.yaml")
        problems = check_dataset_file(task)
        assert any("dim" in p for p in problems)
        assert any("labels" in p for p in problems)
        assert any("modalities" in p for p in problems)

    def test_bad_dim(self, tmp_path):
        task = make_task(tmp_path)
        save_yaml(
            {"task": "x", "dim": 4, "labels": {0: "a"}, "modalities": {0: "CT"}},
            task / "dataset.yaml",
        )
        assert any("dim must be 2 or 3" in p for p in check_dataset_file(task))

    def test_nonconsecutive_labels(self, tmp_path):
        task = make_task(tmp_path)
        save_yaml(
            {"task": "x", "dim": 3, "labels": {0: "a", 2: "b"},
             "modalities": {0: "CT"}},
            task / "dataset.yaml",
        )
        assert any("consecutive" in p for p in check_dataset_file(task))

    def test_bad_target_class(self, tmp_path):
        task = make_task(tmp_path)
        save_yaml(
            {"task": "x", "dim": 3, "labels": {0: "a"}, "modalities": {0: "CT"},
             "target_class": "1"},
            task / "dataset.yaml",
        )
        assert any("target_class" in p for p in check_dataset_file(task))


class TestSplittedConsistency:
    def test_clean_dataset_passes_full(self, tmp_path):
        task = make_task(tmp_path)
        assert check_data_and_label_consistency(task, full=True) == []

    def test_missing_label(self, tmp_path):
        task = make_task(tmp_path)
        (task / "raw_splitted" / "labelsTr" / "case_000.nii.gz").unlink()
        problems = check_data_and_label_splitted(task)
        assert any("missing label volume" in p for p in problems)

    def test_missing_instances_json(self, tmp_path):
        task = make_task(tmp_path)
        (task / "raw_splitted" / "labelsTr" / "case_000.json").unlink()
        problems = check_data_and_label_splitted(task)
        assert any("missing instances json" in p for p in problems)

    def test_instance_ids_must_start_at_one(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.json"
        lbl.write_text(json.dumps({"instances": {"2": 0}}))
        problems = check_data_and_label_splitted(task)
        assert any("consecutive starting at 1" in p for p in problems)

    def test_instance_class_not_declared(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.json"
        lbl.write_text(json.dumps({"instances": {"1": 5}}))
        problems = check_data_and_label_splitted(task)
        assert any("not declared" in p for p in problems)

    def test_instance_class_must_be_int(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.json"
        lbl.write_text(json.dumps({"instances": {"1": "0"}}))
        problems = check_data_and_label_splitted(task)
        assert any("must be an int" in p for p in problems)


class TestFullGeometryTier:
    def test_spacing_mismatch(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.nii.gz"
        seg, _, _ = nifti.load(lbl)
        nifti.save(lbl, seg.astype(np.uint8), spacing=np.asarray([2.0, 1.0, 1.0]))
        problems = check_data_and_label_splitted(task, full_check=True)
        assert any("spacing mismatch" in p for p in problems)
        # light check does not load volumes -> no geometry findings
        assert check_data_and_label_splitted(task, full_check=False) == []

    def test_origin_mismatch(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.nii.gz"
        seg, spacing, affine = nifti.load(lbl)
        affine = np.array(affine)
        affine[:3, 3] += 5.0  # shift origin
        nifti.save(lbl, seg.astype(np.uint8), spacing=spacing, affine=affine)
        problems = check_data_and_label_splitted(task, full_check=True)
        assert any("origin/direction" in p for p in problems)

    def test_shape_mismatch(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.nii.gz"
        nifti.save(lbl, np.zeros((10, 16, 16), np.uint8))
        problems = check_data_and_label_splitted(task, full_check=True)
        assert any("vs label" in p for p in problems)

    def test_mask_instance_not_in_json(self, tmp_path):
        task = make_task(tmp_path)
        lbl = task / "raw_splitted" / "labelsTr" / "case_000.nii.gz"
        seg, spacing, _ = nifti.load(lbl)
        seg = seg.astype(np.uint8)
        seg[0, 0, 0] = 2  # undeclared instance
        nifti.save(lbl, seg, spacing=spacing)
        (task / "raw_splitted" / "labelsTr" / "case_000.json").write_text(
            json.dumps({"instances": {"1": 0, "2": 0}})
        )
        problems = check_data_and_label_splitted(task, full_check=True)
        assert problems == []  # declared both -> consistent
        (task / "raw_splitted" / "labelsTr" / "case_000.json").write_text(
            json.dumps({"instances": {"1": 0}})
        )
        problems = check_data_and_label_splitted(task, full_check=True)
        # the volume has id 2, the json declares only 1 -> consecutive rule
        # holds but volume/json agreement fails
        assert any("missing from the json" in p for p in problems)

    def test_json_instance_not_in_mask(self, tmp_path):
        task = make_task(tmp_path)
        (task / "raw_splitted" / "labelsTr" / "case_000.json").write_text(
            json.dumps({"instances": {"1": 0, "2": 0}})
        )
        problems = check_data_and_label_splitted(task, full_check=True)
        assert any("absent from the label volume" in p for p in problems)
