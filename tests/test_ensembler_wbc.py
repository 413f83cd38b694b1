import numpy as np

from nndetection_tpu.inference.ensembler import BoxEnsemblerWBC, OverlapMap


class TestOverlapMap:
    def test_counts(self):
        om = OverlapMap((16, 16, 16))
        om.add_tile((0, 0, 0), (8, 8, 8))
        om.add_tile((4, 4, 4), (8, 8, 8))
        assert om.map[2, 2, 2] == 1
        assert om.map[6, 6, 6] == 2
        boxes = np.asarray([[5, 5, 7, 7, 5, 7]], np.float64)
        exp = om.mean_overlap_in_boxes(boxes)
        assert exp[0] == 2.0


class TestBoxEnsemblerWBC:
    def test_overlap_dampening(self):
        ens = BoxEnsemblerWBC((32, 32, 32))
        ens.add_model("m0")
        # two overlapping tiles -> box seen by both should expect 2 preds
        ens.process_tile(
            np.asarray([[10, 10, 20, 20, 10, 20]], np.float32),
            np.asarray([0.8], np.float32),
            np.asarray([0], np.int64),
            tile_origin=(0, 0, 0),
            tile_size=(24, 24, 24),
        )
        ens.process_tile(
            np.zeros((0, 6), np.float32),
            np.zeros((0,), np.float32),
            np.zeros((0,), np.int64),
            tile_origin=(8, 8, 8),
            tile_size=(24, 24, 24),
        )
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1
        # seen once but expected twice -> score dampened below raw 0.8
        assert res["pred_scores"][0] < 0.8

    def test_both_tiles_found_less_dampened(self):
        ens = BoxEnsemblerWBC((32, 32, 32))
        ens.add_model("m0")
        # the same case-space box [10..20]^3 seen from both tiles
        for origin in [(0, 0, 0), (8, 8, 8)]:
            o = np.asarray(origin, np.float32)
            box = np.asarray(
                [[10 - o[0], 10 - o[1], 20 - o[0], 20 - o[1], 10 - o[2], 20 - o[2]]],
                np.float32,
            )
            ens.process_tile(
                box,
                np.asarray([0.8], np.float32),
                np.asarray([0], np.int64),
                tile_origin=origin,
                tile_size=(24, 24, 24),
            )
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1
        single = BoxEnsemblerWBC((32, 32, 32))
        single.add_model("m0")
        single.process_tile(
            np.asarray([[10, 10, 20, 20, 10, 20]], np.float32),
            np.asarray([0.8], np.float32),
            np.asarray([0], np.int64),
            tile_origin=(0, 0, 0),
            tile_size=(24, 24, 24),
        )
        single.process_tile(
            np.zeros((0, 6), np.float32), np.zeros((0,), np.float32),
            np.zeros((0,), np.int64), tile_origin=(8, 8, 8), tile_size=(24, 24, 24),
        )
        assert (
            res["pred_scores"][0] > single.get_case_result()["pred_scores"][0]
        )
