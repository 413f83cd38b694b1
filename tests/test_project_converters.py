"""Converter scripts in ``projects/`` against tiny synthetic raw layouts."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from nndetection_tpu.data import nifti
from nndetection_tpu.data.prepare import (
    create_test_split,
    instances_from_segmentation,
    remove_classes,
    seg_to_instances,
)

REPO = Path(__file__).resolve().parents[1]


def _run(script, *args):
    proc = subprocess.run(
        [sys.executable, str(REPO / script), *map(str, args)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


class TestPrepareHelpers:
    def test_seg_to_instances_splits_components(self):
        seg = np.zeros((8, 8, 8), dtype=np.int32)
        seg[1:3, 1:3, 1:3] = 1
        seg[5:7, 5:7, 5:7] = 1
        seg[1:3, 5:7, 5:7] = 2
        inst, classes = seg_to_instances(seg)
        assert sorted(classes.values()) == [1, 1, 2]
        assert inst.max() == 3
        # components of the same class get distinct ids
        assert inst[1, 1, 1] != inst[5, 5, 5]

    def test_seg_to_instances_min_voxels(self):
        seg = np.zeros((8, 8, 8), dtype=np.int32)
        seg[0, 0, 0] = 1
        seg[4:7, 4:7, 4:7] = 1
        inst, classes = seg_to_instances(seg, min_voxels=5)
        assert len(classes) == 1
        assert inst[0, 0, 0] == 0

    def test_remove_classes_compacts(self):
        seg = np.array([0, 1, 2, 3, 2])
        out = remove_classes(seg, [2])
        assert out.tolist() == [0, 1, 0, 2, 0]

    def test_instances_from_segmentation_fg_vs_bg(self, tmp_path):
        seg = np.zeros((8, 8, 8), dtype=np.int32)
        seg[1:3, 1:3, 1:3] = 1
        seg[5:7, 5:7, 5:7] = 2  # touching nothing; different class
        nifti.save(tmp_path / "case.nii.gz", seg, np.ones(3))
        mapping = instances_from_segmentation(
            tmp_path / "case.nii.gz", tmp_path / "out", fg_vs_bg=True
        )
        assert set(mapping.values()) == {0}
        assert len(mapping) == 2
        saved = json.loads((tmp_path / "out" / "case.json").read_text())
        assert saved["instances"] == {"1": 0, "2": 0}

    def test_create_test_split_moves_cases(self, tmp_path):
        images = tmp_path / "imagesTr"
        labels = tmp_path / "labelsTr"
        images.mkdir(parents=True)
        labels.mkdir(parents=True)
        vol = np.zeros((4, 4, 4), dtype=np.float32)
        for i in range(10):
            nifti.save(images / f"case_{i}_0000.nii.gz", vol, np.ones(3))
            nifti.save(labels / f"case_{i}.nii.gz", vol, np.ones(3))
            (labels / f"case_{i}.json").write_text('{"instances": {}}')
        test_ids = create_test_split(tmp_path, num_modalities=1, test_size=0.3)
        assert len(test_ids) == 3
        assert len(list((tmp_path / "imagesTs").glob("*.nii.gz"))) == 3
        assert len(list((tmp_path / "labelsTs").glob("*.json"))) == 3
        assert len(list(images.glob("*.nii.gz"))) == 7


class TestKitsConverter:
    def test_end_to_end(self, tmp_path):
        src = tmp_path / "kits"
        for idx in (0, 1, 2, 250):  # 250 is the unlabeled test cohort
            case = src / f"case_{idx:05d}"
            case.mkdir(parents=True)
            img = np.random.default_rng(idx).normal(size=(12, 12, 12)).astype(
                np.float32
            )
            seg = np.zeros((12, 12, 12), dtype=np.int32)
            seg[2:6, 2:6, 2:6] = 1  # kidney: stuff, dropped
            seg[8:11, 8:11, 8:11] = 2  # tumour: the detection target
            nifti.save(case / "imaging.nii.gz", img, np.ones(3))
            nifti.save(case / "segmentation.nii.gz", seg, np.ones(3))
        out = tmp_path / "task"
        _run(
            "projects/Task011_Kits/prepare.py",
            "--source", src, "--out", out, "--test-size", "0.0",
        )
        imgs = sorted((out / "raw_splitted" / "imagesTr").glob("*.nii.gz"))
        assert len(imgs) == 3  # case 250 skipped
        inst, _, _ = nifti.load(
            out / "raw_splitted" / "labelsTr" / "case_00000.nii.gz"
        )
        # kidney removed, single tumour instance of class 0
        assert int(inst.max()) == 1
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / "case_00000.json").read_text()
        )
        assert mapping["instances"] == {"1": 0}


class TestCadaConverter:
    def test_end_to_end(self, tmp_path):
        src = tmp_path / "cada"
        (src / "train_dataset").mkdir(parents=True)
        (src / "train_mask_images").mkdir(parents=True)
        img = np.zeros((10, 10, 10), dtype=np.float32)
        mask = np.zeros((10, 10, 10), dtype=np.int32)
        mask[1:3, 1:3, 1:3] = 1
        mask[6:9, 6:9, 6:9] = 2  # already instance-labelled
        nifti.save(src / "train_dataset" / "A001_orig.nii.gz", img, np.ones(3))
        nifti.save(
            src / "train_mask_images" / "A001_labeledMasks.nii.gz", mask, np.ones(3)
        )
        out = tmp_path / "task"
        _run("projects/Task017_CADA/prepare.py", "--source", src, "--out", out)
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / "A001.json").read_text()
        )
        assert mapping["instances"] == {"1": 0, "2": 0}
        assert (out / "raw_splitted" / "imagesTr" / "A001_0000.nii.gz").exists()


class TestAdamConverter:
    def test_end_to_end(self, tmp_path):
        src = tmp_path / "adam"
        subj = src / "10001"
        (subj / "pre").mkdir(parents=True)
        img = np.zeros((10, 10, 10), dtype=np.float32)
        mask = np.zeros((10, 10, 10), dtype=np.int32)
        mask[2:4, 2:4, 2:4] = 1  # untreated
        mask[7:9, 7:9, 7:9] = 2  # treated -> still fg in fg-vs-bg mode
        nifti.save(subj / "pre" / "struct_aligned.nii.gz", img, np.ones(3))
        nifti.save(subj / "pre" / "TOF.nii.gz", img, np.ones(3))
        nifti.save(subj / "aneurysms.nii.gz", mask, np.ones(3))
        out = tmp_path / "task"
        _run("projects/Task019_ADAM/prepare.py", "--source", src, "--out", out)
        assert (out / "raw_splitted" / "imagesTr" / "10001_0000.nii.gz").exists()
        assert (out / "raw_splitted" / "imagesTr" / "10001_0001.nii.gz").exists()
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / "10001.json").read_text()
        )
        assert mapping["instances"] == {"1": 0, "2": 0}
