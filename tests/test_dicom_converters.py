"""LymphNodes + ProstateX converters on synthetic DICOM/mhd/nifti inputs."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
from test_dicom import write_slice

from nndetection_tpu.data import nifti

REPO = Path(__file__).resolve().parents[1]


def write_series(d: Path, vol: np.ndarray, spacing=(2.5, 0.8, 0.7),
                 origin=(0.0, 0.0, 0.0), series_uid="1.2.3"):
    d.mkdir(parents=True, exist_ok=True)
    for k in range(vol.shape[0]):
        write_slice(
            d / f"{k:03d}.dcm",
            vol[k].astype(np.int16),
            (origin[0], origin[1], origin[2] + spacing[0] * k),
            series_uid=series_uid,
            pixel_spacing=(spacing[1], spacing[2]),
        )


def write_mhd(path: Path, vol: np.ndarray, spacing_xyz=(1, 1, 1)):
    raw_name = path.with_suffix(".raw").name
    header = (
        "ObjectType = Image\n"
        "NDims = 3\n"
        f"DimSize = {vol.shape[2]} {vol.shape[1]} {vol.shape[0]}\n"
        "ElementType = MET_FLOAT\n"
        f"ElementSpacing = {spacing_xyz[0]} {spacing_xyz[1]} {spacing_xyz[2]}\n"
        "Offset = 0 0 0\n"
        f"ElementDataFile = {raw_name}\n"
    )
    path.write_text(header)
    path.with_suffix(".raw").write_bytes(
        np.ascontiguousarray(vol.astype("<f4")).tobytes()
    )


def _run(script, *args):
    proc = subprocess.run(
        [sys.executable, str(REPO / script), *map(str, args)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


class TestLymphNodesConverter:
    def test_end_to_end(self, tmp_path):
        rng = np.random.default_rng(3)
        vol = rng.integers(-500, 500, size=(6, 8, 8)).astype(np.int16)
        images_root = tmp_path / "CT Lymph Nodes"
        write_series(images_root / "PAT0001" / "study" / "series1", vol)
        mask = np.zeros(vol.shape, dtype=np.int32)
        mask[1:3, 1:4, 1:4] = 1
        mask[4:6, 5:8, 5:8] = 1
        masks_root = tmp_path / "MASKS"
        masks_root.mkdir()
        nifti.save(masks_root / "PAT0001_mask.nii.gz", mask, np.ones(3))
        out = tmp_path / "task"
        _run(
            "projects/Task025_LymphNodes/prepare.py",
            "--images", images_root, "--masks", masks_root, "--out", out,
        )
        img, spacing, _ = nifti.load(
            out / "raw_splitted" / "imagesTr" / "PAT0001_0000.nii.gz"
        )
        np.testing.assert_array_equal(img.astype(np.int16), vol)
        np.testing.assert_allclose(spacing, [2.5, 0.8, 0.7])
        inst, _, _ = nifti.load(
            out / "raw_splitted" / "labelsTr" / "PAT0001.nii.gz"
        )
        assert int(inst.max()) == 2  # two connected components
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / "PAT0001.json").read_text()
        )
        assert mapping["instances"] == {"1": 0, "2": 0}


class TestProstateXConverter:
    def test_end_to_end(self, tmp_path):
        cid = "ProstateX-0000"
        shape = (4, 8, 8)
        rng = np.random.default_rng(5)
        t2 = rng.integers(0, 800, size=shape).astype(np.int16)
        adc = rng.integers(0, 2000, size=shape).astype(np.int16)
        pdw = rng.integers(0, 400, size=shape).astype(np.int16)

        data_root = tmp_path / "PROSTATEx"
        case = data_root / cid / "study"
        write_series(case / "3-t2tsetra", t2, spacing=(3.0, 0.5, 0.5),
                     series_uid="1.1")
        write_series(case / "7-ep2dADC", adc, spacing=(3.0, 0.5, 0.5),
                     series_uid="1.2")
        write_series(case / "5-tfl PD ref", pdw, spacing=(3.0, 0.5, 0.5),
                     series_uid="1.3")

        ktrans_root = tmp_path / "ktrans"
        (ktrans_root / cid).mkdir(parents=True)
        # same world extent as T2: spacing (x,y,z) matches (0.5, 0.5, 3.0)
        write_mhd(
            ktrans_root / cid / f"{cid}-Ktrans.mhd",
            rng.normal(size=shape).astype(np.float32),
            spacing_xyz=(0.5, 0.5, 3.0),
        )

        masks_root = tmp_path / "masks"
        masks_root.mkdir()
        m = np.zeros(shape, dtype=np.uint8)
        m[1:3, 2:5, 2:5] = 1
        nifti.save(masks_root / f"{cid}-Finding1-t2.nii.gz", m, np.ones(3))

        findings_csv = tmp_path / "findings.csv"
        findings_csv.write_text(
            "ProxID,fid,pos,ClinSig\n"
            f"{cid},1,0 0 0,TRUE\n"
        )

        out = tmp_path / "task"
        _run(
            "projects/Task021_ProstateX/prepare.py",
            "--data", data_root, "--ktrans", ktrans_root,
            "--t2-masks", masks_root, "--findings", findings_csv, "--out", out,
        )
        images = out / "raw_splitted" / "imagesTr"
        for mod in range(4):
            assert (images / f"{cid}_{mod:04d}.nii.gz").exists(), mod
        img0, _, _ = nifti.load(images / f"{cid}_0000.nii.gz")
        np.testing.assert_array_equal(img0.astype(np.int16), t2)
        # ADC shares the T2 grid -> resample-to-reference is the identity
        img1, _, _ = nifti.load(images / f"{cid}_0001.nii.gz")
        np.testing.assert_allclose(img1, adc.astype(np.float32), atol=1e-2)
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / f"{cid}.json").read_text()
        )
        assert mapping["instances"] == {"1": 1}  # clinically significant
