import numpy as np

from nndetection_tpu.inference.ensembler import BoxEnsemblerSelective
from nndetection_tpu.inference.sweeper import BoxSweeper


def make_state(tmp_path, cid, gt_box, noise_boxes, rng):
    """One case: a confident true positive + low-score clutter."""
    ens = BoxEnsemblerSelective((64, 64, 64))
    ens.add_model("m0")
    boxes = np.concatenate([[gt_box], noise_boxes]).astype(np.float32)
    scores = np.concatenate([[0.9], rng.uniform(0.05, 0.25, len(noise_boxes))]).astype(
        np.float32
    )
    labels = np.zeros(len(boxes), np.int64)
    ens.process_tile(boxes, scores, labels, tile_origin=(0, 0, 0), tile_size=(64, 64, 64))
    ens.save_state(tmp_path, cid)
    np.savez(
        tmp_path / f"{cid}_boxes_gt.npz",
        boxes=np.asarray([gt_box], np.float32),
        classes=np.zeros(1, np.int64),
    )


class TestBoxSweeper:
    def test_sweep_improves_or_keeps_score(self, tmp_path, rng):
        for i in range(3):
            gt = np.asarray([10 + i, 10, 20 + i, 20, 10, 20], np.float64)
            noise = np.stack(
                [
                    [40, 40, 44, 44, 40, 44],
                    [50, 50, 55, 55, 50, 55],
                ]
            ).astype(np.float64)
            make_state(tmp_path, f"case_{i}", gt, noise, rng)
        sweeper = BoxSweeper(
            ["lesion"], state_dir=tmp_path, gt_dir=tmp_path, save_dir=tmp_path
        )
        baseline = sweeper._evaluate_params(
            BoxEnsemblerSelective.get_default_parameters()
        )
        plan = sweeper.run_postprocessing_sweep()
        assert plan["score"] >= baseline
        assert (tmp_path / "plan_inference.pkl").exists()
        assert (tmp_path / "sweep_results.json").exists()
        # higher score threshold should kill the clutter -> near-perfect AP
        assert plan["score"] > 0.9

    def test_sweep_deterministic(self, tmp_path, rng):
        for i in range(2):
            gt = np.asarray([10, 10, 20, 20, 10, 20], np.float64)
            make_state(tmp_path, f"case_{i}", gt, np.zeros((0, 6)), rng)
        sw = BoxSweeper(["c"], state_dir=tmp_path, gt_dir=tmp_path, save_dir=None)
        p1 = sw.run_postprocessing_sweep()
        p2 = sw.run_postprocessing_sweep()
        assert p1["parameters"] == p2["parameters"]
        assert p1["score"] == p2["score"]

    def test_score_thresh_kills_clutter(self, tmp_path, rng):
        """Raising model_score_thresh must remove the low-score noise boxes
        from the case result (the mechanism the sweep exploits)."""
        gt = np.asarray([10, 10, 20, 20, 10, 20], np.float64)
        noise = np.asarray([[40, 40, 44, 44, 40, 44]], np.float64)
        make_state(tmp_path, "case_t", gt, noise, rng)
        ens = BoxEnsemblerSelective.from_checkpoint(
            tmp_path / "case_t_boxes_state.pkl"
        )
        ens.update_parameters(model_score_thresh=0.5)
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1
        assert res["pred_scores"][0] > 0.5


class TestMultiModelEnsemble:
    def test_two_model_streams_consolidate(self, tmp_path, rng):
        """Two model streams predicting the same object cluster into one box
        via WBC with n_exp = num streams (reference Selective semantics)."""
        ens = BoxEnsemblerSelective((64, 64, 64))
        gt = np.asarray([10, 10, 20, 20, 10, 20], np.float32)
        for m, jitter in (("m0", 0.0), ("m1", 0.5)):
            ens.add_model(m)
            ens.process_tile(
                (gt + jitter)[None],
                np.asarray([0.8], np.float32),
                np.zeros(1, np.int64),
                tile_origin=(0, 0, 0),
                tile_size=(64, 64, 64),
            )
        res = ens.get_case_result()
        assert len(res["pred_boxes"]) == 1
        # consolidated box is a score-weighted average of the two streams
        np.testing.assert_allclose(res["pred_boxes"][0], gt + 0.25, atol=0.05)

    def test_multiclass_separate_clusters(self, tmp_path, rng):
        ens = BoxEnsemblerSelective((64, 64, 64))
        ens.add_model("m0")
        boxes = np.asarray(
            [[10, 10, 20, 20, 10, 20], [10, 10, 20, 20, 10, 20]], np.float32
        )
        ens.process_tile(
            boxes,
            np.asarray([0.9, 0.8], np.float32),
            np.asarray([0, 1], np.int64),  # same box, different class
            tile_origin=(0, 0, 0),
            tile_size=(64, 64, 64),
        )
        res = ens.get_case_result()
        # class-batched suppression keeps both classes
        assert sorted(res["pred_labels"].tolist()) == [0, 1]


class TestEnsemblerMemoization:
    def test_memoized_results_match_fresh_ensembler(self, tmp_path, rng):
        """A persistent ensembler swept through many parameter combos must
        return bit-identical results to a freshly loaded ensembler at each
        combo (the sweeper holds instances in memory across ~25 trials)."""
        gt = np.asarray([10, 10, 20, 20, 10, 20], np.float64)
        noise = rng.uniform(5, 55, (20, 1)) + np.asarray(
            [[0, 0, 6, 6, 0, 6]], np.float64
        )
        make_state(tmp_path, "case_m", gt, noise, rng)
        persistent = BoxEnsemblerSelective.from_checkpoint(
            tmp_path / "case_m_boxes_state.pkl"
        )
        defaults, space = BoxEnsemblerSelective.sweep_parameters()
        for pname, values in space.items():
            for v in values:
                params = dict(defaults, **{pname: v})
                persistent.update_parameters(**params)
                got = persistent.get_case_result()
                fresh = BoxEnsemblerSelective.from_checkpoint(
                    tmp_path / "case_m_boxes_state.pkl"
                )
                fresh.update_parameters(**params)
                want = fresh.get_case_result()
                for k in ("pred_boxes", "pred_scores", "pred_labels"):
                    np.testing.assert_array_equal(got[k], want[k], err_msg=f"{pname}={v} {k}")

    def test_cache_invalidated_by_new_tiles(self, tmp_path, rng):
        ens = BoxEnsemblerSelective((64, 64, 64))
        ens.add_model("m0")
        b = np.asarray([[10, 10, 20, 20, 10, 20]], np.float32)
        ens.process_tile(b, np.asarray([0.9], np.float32), np.zeros(1, np.int64),
                         tile_origin=(0, 0, 0), tile_size=(64, 64, 64))
        r1 = ens.get_case_result()
        assert len(r1["pred_boxes"]) == 1
        ens.process_tile(b + 30, np.asarray([0.8], np.float32), np.zeros(1, np.int64),
                         tile_origin=(0, 0, 0), tile_size=(64, 64, 64))
        r2 = ens.get_case_result()
        assert len(r2["pred_boxes"]) == 2
