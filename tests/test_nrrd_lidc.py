"""NRRD reader + LIDC converter on synthetic data."""
import gzip
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from nndetection_tpu.data import nifti, nrrd

REPO = Path(__file__).resolve().parents[1]


def write_nrrd(path: Path, data: np.ndarray, spacing_xyz, encoding="gzip"):
    """Write a simple attached-data NRRD (sizes fastest-first = x,y,z)."""
    sizes = " ".join(str(s) for s in reversed(data.shape))
    dirs = " ".join(f"({s},0,0)" if i == 0 else f"(0,{s},0)" if i == 1 else f"(0,0,{s})"
                    for i, s in enumerate(spacing_xyz))
    header = (
        "NRRD0004\n"
        f"type: {data.dtype.name}\n"
        "dimension: 3\n"
        "space: left-posterior-superior\n"
        f"sizes: {sizes}\n"
        f"space directions: {dirs}\n"
        "space origin: (1.0,2.0,3.0)\n"
        "endian: little\n"
        f"encoding: {encoding}\n"
        "\n"
    )
    raw = np.ascontiguousarray(data).tobytes()
    if encoding == "gzip":
        raw = gzip.compress(raw)
    path.write_bytes(header.encode("ascii") + raw)


class TestNrrd:
    def test_roundtrip_gzip(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.integers(-1000, 1000, size=(5, 6, 7)).astype(np.int16)
        write_nrrd(tmp_path / "v.nrrd", vol, [0.7, 0.8, 2.5])
        data, spacing, origin = nrrd.load(tmp_path / "v.nrrd")
        np.testing.assert_array_equal(data, vol)
        np.testing.assert_allclose(spacing, [2.5, 0.8, 0.7])  # k,j,i order
        np.testing.assert_allclose(origin, [1.0, 2.0, 3.0])

    def test_raw_encoding(self, tmp_path):
        vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        write_nrrd(tmp_path / "v.nrrd", vol, [1, 1, 1], encoding="raw")
        data, _, _ = nrrd.load(tmp_path / "v.nrrd")
        np.testing.assert_array_equal(data, vol)


class TestLidcConverter:
    def test_end_to_end(self, tmp_path):
        src = tmp_path / "lidc"
        case = src / "LIDC-IDRI-0001"
        case.mkdir(parents=True)
        shape = (10, 12, 12)
        img = np.random.default_rng(1).integers(-500, 500, size=shape).astype(
            np.int16
        )
        write_nrrd(case / "LIDC-IDRI-0001_ct_scan.nrrd", img, [1, 1, 1])

        # nodule 1: 3/4 raters agree -> kept; mean malignancy 4 -> class 1
        m = np.zeros(shape, dtype=np.uint8)
        m[2:5, 2:5, 2:5] = 1
        for rid in (1, 2, 3):
            nifti.save(case / f"LIDC-IDRI-0001_mask_001_{rid}.nii.gz", m, np.ones(3))
        # nodule 2: 1/4 raters -> suppressed by majority vote
        m2 = np.zeros(shape, dtype=np.uint8)
        m2[7:9, 7:9, 7:9] = 1
        nifti.save(case / "LIDC-IDRI-0001_mask_002_1.nii.gz", m2, np.ones(3))

        with open(src / "characteristics.csv", "w") as f:
            f.write("PatientID,NoduleID,Malignancy\n")
            for r in (4, 4, 4):
                f.write(f"LIDC-IDRI-0001,1,{r}\n")
            f.write("LIDC-IDRI-0001,2,2\n")

        out = tmp_path / "task"
        proc = subprocess.run(
            [sys.executable, str(REPO / "projects/Task012_LIDC/prepare.py"),
             "--source", str(src), "--out", str(out)],
            capture_output=True, text=True,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr

        inst, _, _ = nifti.load(out / "raw_splitted" / "labelsTr" / "LIDC-IDRI-0001.nii.gz")
        assert int(inst.max()) == 1  # nodule 2 suppressed
        assert (inst[3, 3, 3] == 1).all()
        mapping = json.loads(
            (out / "raw_splitted" / "labelsTr" / "LIDC-IDRI-0001.json").read_text()
        )
        assert mapping["instances"] == {"1": 1}  # malignant
        assert mapping["scores"]["1"] == 4.0
        img_out, spacing, _ = nifti.load(
            out / "raw_splitted" / "imagesTr" / "LIDC-IDRI-0001_0000.nii.gz"
        )
        np.testing.assert_array_equal(img_out.astype(np.int16), img)
