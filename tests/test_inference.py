import numpy as np
import pytest

from nndetection_tpu.inference.ensembler import BoxEnsemblerSelective, SegmentationEnsembler
from nndetection_tpu.inference.restore import restore_detection, restore_fmap
from nndetection_tpu.inference.tta import get_tta_flips, flip_image, invert_boxes


class TestTTA:
    def test_num_variants(self):
        assert len(get_tta_flips(3)) == 8
        assert len(get_tta_flips(2)) == 4
        assert get_tta_flips(3, enabled=False) == [()]

    def test_flip_roundtrip(self, rng):
        img = rng.rand(2, 8, 8, 8, 1)
        for flips in get_tta_flips(3):
            back = flip_image(flip_image(img, flips), flips)
            np.testing.assert_array_equal(back, img)

    def test_box_inversion(self):
        # box found on a flipped tile maps back correctly
        patch = (16, 16, 16)
        box = np.asarray([[2, 3, 6, 8, 1, 5]], np.float64)
        for flips in get_tta_flips(3):
            inv = invert_boxes(invert_boxes(box, flips, patch), flips, patch)
            np.testing.assert_allclose(inv, box)
        inv = invert_boxes(box, (0,), patch)
        np.testing.assert_allclose(inv[0], [10, 3, 14, 8, 1, 5])

    def test_box_matches_flipped_object(self, rng):
        """An object detected in a flipped volume maps to the original place."""
        seg = np.zeros((10, 12, 14), np.int16)
        seg[2:5, 3:6, 4:8] = 1
        from nndetection_tpu.data.instances import instances_to_boxes_np

        orig_box, _ = instances_to_boxes_np(seg)
        flips = (0, 2)
        flipped = np.flip(seg, axis=flips)
        fbox, _ = instances_to_boxes_np(np.ascontiguousarray(flipped))
        back = invert_boxes(fbox, flips, seg.shape)
        np.testing.assert_allclose(back, orig_box)


class TestBoxEnsembler:
    def _fill(self, ens, stream, box, score, origin=(0, 0, 0)):
        ens.add_model(stream)
        ens.process_tile(
            np.asarray([box], np.float32),
            np.asarray([score], np.float32),
            np.asarray([0], np.int64),
            tile_origin=origin,
            tile_size=(32, 32, 32),
        )

    def test_single_model_passthrough(self):
        ens = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens, "m0", [10, 10, 20, 20, 10, 20], 0.9)
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1
        np.testing.assert_allclose(res["pred_boxes"][0], [10, 10, 20, 20, 10, 20])

    def test_tile_offset_applied(self):
        ens = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens, "m0", [0, 0, 8, 8, 0, 8], 0.9, origin=(16, 20, 24))
        res = ens.get_case_result()
        np.testing.assert_allclose(res["pred_boxes"][0], [16, 20, 24, 28, 24, 32])

    def test_cross_model_wbc_merges(self):
        ens = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens, "m0", [10, 10, 20, 20, 10, 20], 0.8)
        self._fill(ens, "m1", [11, 11, 21, 21, 11, 21], 0.6)
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1  # clustered
        # found by both models -> no missing-prediction dampening; score between
        assert 0.6 < res["pred_scores"][0] <= 0.82

    def test_missing_model_dampens_score(self):
        ens2 = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens2, "m0", [10, 10, 20, 20, 10, 20], 0.8)
        self._fill(ens2, "m1", [11, 11, 21, 21, 11, 21], 0.8)
        both = ens2.get_case_result()["pred_scores"][0]

        ens1 = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens1, "m0", [10, 10, 20, 20, 10, 20], 0.8)
        ens1.add_model("m1")  # m1 found nothing
        single = ens1.get_case_result()["pred_scores"][0]
        assert single < both

    def test_state_roundtrip(self, tmp_path):
        ens = BoxEnsemblerSelective((64, 64, 64))
        self._fill(ens, "m0", [10, 10, 20, 20, 10, 20], 0.9)
        ens.save_state(tmp_path, "case_0")
        back = BoxEnsemblerSelective.from_checkpoint(
            tmp_path / "case_0_boxes_state.pkl"
        )
        res = back.get_case_result()
        assert len(res["pred_boxes"]) == 1

    def test_border_weight_plateau(self):
        w_center = BoxEnsemblerSelective._get_box_in_tile_weight(
            np.asarray([[16.0, 16.0, 16.0]]), (32, 32, 32)
        )
        w_corner = BoxEnsemblerSelective._get_box_in_tile_weight(
            np.asarray([[0.0, 0.0, 0.0]]), (32, 32, 32)
        )
        assert w_center[0] == pytest.approx(1.0)
        assert w_corner[0] == pytest.approx(0.5)


class TestSegEnsembler:
    def test_overlap_normalization(self):
        ens = SegmentationEnsembler((8, 8, 8), num_classes=2)
        probs = np.zeros((8, 8, 4, 2), np.float32)
        probs[..., 1] = 0.9
        probs[..., 0] = 0.1
        ens.process_tile(probs, (0, 0, 0))
        ens.process_tile(probs, (0, 0, 4))
        seg = ens.get_case_result()
        assert (seg == 1).all()


class TestRestore:
    def test_restore_detection(self):
        boxes = np.asarray([[4, 8, 8, 16, 2, 6]], np.float64)
        out = restore_detection(
            boxes,
            transpose_forward=[0, 1, 2],
            original_spacing=[1.0, 1.0, 1.0],
            resampled_spacing=[2.0, 0.5, 1.0],
            crop_bbox=[[5, 99], [10, 99], [15, 99]],
        )
        # axis0 scaled by 2, axis1 by 0.5, axis2 by 1, plus crop offsets
        np.testing.assert_allclose(out[0], [13, 14, 21, 18, 17, 21])

    def test_restore_with_transpose(self):
        boxes = np.asarray([[0, 0, 2, 4, 0, 6]], np.float64)  # transposed space
        out = restore_detection(
            boxes,
            transpose_forward=[2, 0, 1],
            original_spacing=[1, 1, 1],
            resampled_spacing=[1, 1, 1],
        )
        # inverse of (2,0,1) is (1,2,0): sizes (2,4,6) -> axes (4,6,2)
        np.testing.assert_allclose(out[0], [0, 0, 4, 6, 0, 2])

    def test_restore_fmap(self):
        seg = np.ones((4, 4, 4), np.int16)
        out = restore_fmap(
            seg,
            transpose_forward=[0, 1, 2],
            original_shape_cropped=(8, 8, 8),
            original_shape=(12, 12, 12),
            crop_bbox=[[2, 10], [2, 10], [2, 10]],
        )
        assert out.shape == (12, 12, 12)
        assert out[5, 5, 5] == 1
        assert out[0, 0, 0] == 0


class TestMultiModelFusedPath:
    def test_multi_matches_sequential(self):
        """The fold-vmapped fused inference call must reproduce the
        per-model loop's case result (same streams, same ensembling)."""
        import jax
        import numpy as np

        from nndetection_tpu.inference.predictor import ModelBundle, Predictor
        from nndetection_tpu.models import RetinaUNet, RetinaUNetConfig

        cfg = RetinaUNetConfig(
            conv_kernels=((3, 3, 3),) * 3,
            strides=((2, 2, 2),) * 2,
            decoder_levels=(1, 2),
            patch_size=(16, 16, 16),
            anchor_width=((4.0, 8.0),) * 2,
            anchor_height=((4.0, 8.0),) * 2,
            anchor_depth=((4.0, 8.0),) * 2,
            start_channels=4,
            fpn_channels=8,
            head_channels=8,
            topk_candidates=50,
            detections_per_img=10,
        )
        model = RetinaUNet(cfg)
        x0 = np.zeros((1, *cfg.patch_size, 1), np.float32)
        p0 = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        # identical params in both lanes: lane outputs must be BIT-identical,
        # which pins the model-axis plumbing (stacking + in_axes + slicing).
        # A vmapped program is a different XLA program than the single one,
        # so bf16 compute diverges by ~1e-3 and near-tie top-k selection can
        # reorder — only score closeness is guaranteed across programs.
        bundles = [
            ModelBundle(cfg=cfg, params=p0, name=f"fold{i}") for i in range(2)
        ]
        rng = np.random.default_rng(0)
        import ml_dtypes

        p = Predictor(bundles, batch_size=2, tta=True)
        assert p._multi

        tiles = rng.normal(size=(p.tiles_per_call, *cfg.patch_size, 1)).astype(
            ml_dtypes.bfloat16
        )
        stacked = jax.tree.map(
            lambda *xs: np.stack(xs), *[b.params for b in bundles]
        )
        fused = jax.device_get(p._infer_multi(stacked, tiles))
        single = jax.device_get(p._infer(p0, tiles))
        for key in ("boxes", "scores", "labels", "valid"):
            lane0 = np.asarray(fused[key][0])
            np.testing.assert_array_equal(
                lane0, np.asarray(fused[key][1]), err_msg=f"lanes differ: {key}"
            )
            assert lane0.shape == np.asarray(single[key]).shape
        np.testing.assert_allclose(
            np.asarray(fused["scores"][0], np.float32),
            np.asarray(single["scores"], np.float32),
            atol=5e-3,
        )
        np.testing.assert_array_equal(fused["valid"][0], single["valid"])

        # and the fused end-to-end case path runs and returns sane output
        data = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
        out = p.predict_case(data)
        assert out["pred_boxes"].shape[1] == 6
        assert len(out["pred_boxes"]) == len(out["pred_scores"])


class TestTileSizing:
    """The tiles/call default comes from a voxel budget (predictor.py): it
    must reproduce the chip-proven operating points for the three benchmark
    configurations, and the env overrides must win."""

    def _bundle(self, patch):
        from nndetection_tpu.inference.predictor import ModelBundle
        from nndetection_tpu.models import RetinaUNetConfig

        cfg = RetinaUNetConfig(
            conv_kernels=((3, 3, 3),) * 3,
            strides=((2, 2, 2),) * 2,
            decoder_levels=(1, 2),
            patch_size=patch,
            anchor_width=((4.0, 8.0),) * 2,
            anchor_height=((4.0, 8.0),) * 2,
            anchor_depth=((4.0, 8.0),) * 2,
        )
        return ModelBundle(cfg=cfg, params=None)

    @pytest.mark.parametrize(
        "patch,tta,expected",
        [
            ((96, 128, 128), True, 2),   # deploy point: 2 tiles x 8 flips
            ((96, 128, 128), False, 16),  # no-TTA: 16 tiles/call
            ((40, 96, 96), True, 8),     # CV-campaign sweep point
        ],
    )
    def test_voxel_budget_defaults(self, patch, tta, expected, monkeypatch):
        from nndetection_tpu.inference.predictor import Predictor

        monkeypatch.delenv("NNDET_INFER_TILE_FACTOR", raising=False)
        monkeypatch.delenv("NNDET_INFER_BATCH_VOXELS", raising=False)
        p = Predictor([self._bundle(patch)], batch_size=8, tta=tta)
        assert p.tiles_per_call == expected

    def test_env_overrides(self, monkeypatch):
        from nndetection_tpu.inference.predictor import Predictor

        monkeypatch.setenv("NNDET_INFER_TILE_FACTOR", "8")
        p = Predictor([self._bundle((40, 96, 96))], batch_size=4, tta=True)
        assert p.tiles_per_call == 4 * 8 // 8
        monkeypatch.delenv("NNDET_INFER_TILE_FACTOR")
        monkeypatch.setenv("NNDET_INFER_BATCH_VOXELS", str(40 * 96 * 96 * 8))
        p = Predictor([self._bundle((40, 96, 96))], batch_size=4, tta=True)
        assert p.tiles_per_call == 1
