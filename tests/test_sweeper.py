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
