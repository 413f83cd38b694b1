import numpy as np
import pytest

from nndetection_tpu.data import mhd, nifti
from nndetection_tpu.data.aug_presets import get_augmentation
from nndetection_tpu.evaluator.case import CaseEvaluator


class TestAugPresets:
    def test_all_presets_build(self):
        for name in ("no_aug", "default", "base_more", "more", "insane"):
            cfg = get_augmentation(name, (32, 32, 32))
            assert cfg.patch_size == (32, 32, 32)
        assert get_augmentation("no_aug", (8, 8, 8)).p_rotation == 0.0
        assert get_augmentation("insane", (8, 8, 8)).p_rotation > get_augmentation(
            "base_more", (8, 8, 8)
        ).p_rotation


class TestCaseEvaluator:
    def test_auroc_perfect(self):
        ev = CaseEvaluator(["lesion"])
        # positive cases score high, negatives low
        for s, has_gt in [(0.9, 1), (0.8, 1), (0.1, 0), (0.2, 0)]:
            ev.add_case(
                np.asarray([s]), np.asarray([0]),
                np.asarray([0] * has_gt),
            )
        out = ev.finish_online_evaluation()
        assert out["case_auroc"] == pytest.approx(1.0)

    def test_single_class_nan(self):
        ev = CaseEvaluator(["lesion"])
        ev.add_case(np.asarray([0.9]), np.asarray([0]), np.asarray([0]))
        out = ev.finish_online_evaluation()
        assert np.isnan(out["case_auroc"])


class TestMHD:
    def _write_mhd(self, tmp_path, data, spacing_xyz=(1.0, 1.0, 2.0), origin=(-10, -20, -30)):
        raw = tmp_path / "vol.raw"
        # mhd data layout: x fastest; our data is [k,j,i]
        raw.write_bytes(np.ascontiguousarray(data).tobytes())
        shape_ijk = list(reversed(data.shape))
        hdr = (
            "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = False\nCompressedData = False\n"
            f"DimSize = {' '.join(map(str, shape_ijk))}\n"
            f"ElementSpacing = {' '.join(map(str, spacing_xyz))}\n"
            f"Offset = {' '.join(map(str, origin))}\n"
            "ElementType = MET_SHORT\nElementDataFile = vol.raw\n"
        )
        (tmp_path / "vol.mhd").write_text(hdr)
        return tmp_path / "vol.mhd"

    def test_roundtrip(self, rng, tmp_path):
        data = rng.randint(-1000, 1000, (4, 6, 8)).astype(np.int16)
        p = self._write_mhd(tmp_path, data)
        back, spacing, origin = mhd.load(p)
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(spacing, [2.0, 1.0, 1.0])  # reversed
        np.testing.assert_allclose(origin, [-10, -20, -30])

    def test_world_to_voxel(self):
        spacing_kji = np.asarray([2.0, 1.0, 1.0])
        origin_xyz = np.asarray([-10.0, -20.0, -30.0])
        vox = mhd.world_to_voxel(np.asarray([-5.0, -18.0, -26.0]), origin_xyz, spacing_kji)
        np.testing.assert_allclose(vox, [2.0, 2.0, 5.0])  # (k, j, i)


class TestLunaConverter:
    def test_convert_and_export(self, rng, tmp_path):
        import sys
        sys.path.insert(0, "projects/Task016_Luna")
        import prepare as luna

        src = tmp_path / "LUNA16"
        (src / "subset0").mkdir(parents=True)
        data = rng.randint(-1000, 400, (32, 48, 48)).astype(np.int16)
        raw = np.ascontiguousarray(data).tobytes()
        (src / "subset0" / "case1.raw").write_bytes(raw)
        (src / "subset0" / "case1.mhd").write_text(
            "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = False\nDimSize = 48 48 32\n"
            "ElementSpacing = 0.7 0.7 1.25\nOffset = -100 -100 -50\n"
            "ElementType = MET_SHORT\nElementDataFile = case1.raw\n"
        )
        # one nodule at world coords mapping to roughly the center
        import csv as _csv
        with open(src / "annotations.csv", "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "diameter_mm"])
            w.writerow(["case1", -100 + 24 * 0.7, -100 + 24 * 0.7, -50 + 16 * 1.25, 8.0])
        out = tmp_path / "Task016_Luna"
        luna.convert(src, out)
        mask, sp, _ = nifti.load(out / "raw_splitted" / "labelsTr" / "case1.nii.gz")
        assert (mask == 1).sum() > 0
        # nodule centered at voxel (16, 24, 24)
        assert mask[16, 24, 24] == 1
