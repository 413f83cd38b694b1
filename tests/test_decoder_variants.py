import jax
import numpy as np
import jax.numpy as jnp

from nndetection_tpu.models.decoder import PAUFPN, UFPN


def _fmaps(rng, channels=(8, 16, 32), base=16):
    out = []
    for i, c in enumerate(channels):
        s = base // (2**i)
        out.append(jnp.asarray(rng.rand(1, s, s, s, c).astype(np.float32)))
    return out


class TestDecoders:
    def test_ufpn_shapes(self, rng):
        fmaps = _fmaps(rng)
        dec = UFPN(
            strides=((1, 1, 1), (2, 2, 2), (4, 4, 4)),
            conv_kernels=((3, 3, 3),) * 3,
            decoder_levels=(1, 2),
            fixed_out_channels=16,
            dim=3,
            dtype=jnp.float32,
        )
        params = dec.init(jax.random.PRNGKey(0), fmaps)
        outs = dec.apply(params, fmaps)
        assert [o.shape[-1] for o in outs] == [8, 16, 16]
        assert [o.shape[1] for o in outs] == [16, 8, 4]

    def test_paufpn_shapes(self, rng):
        fmaps = _fmaps(rng)
        dec = PAUFPN(
            strides=((1, 1, 1), (2, 2, 2), (4, 4, 4)),
            conv_kernels=((3, 3, 3),) * 3,
            decoder_levels=(1, 2),
            fixed_out_channels=16,
            dim=3,
            dtype=jnp.float32,
        )
        params = dec.init(jax.random.PRNGKey(0), fmaps)
        outs = dec.apply(params, fmaps)
        assert [o.shape[-1] for o in outs] == [8, 16, 16]
        assert [o.shape[1] for o in outs] == [16, 8, 4]


class TestAnalysisSuite:
    def test_run_analysis(self, rng, tmp_path):
        from nndetection_tpu.utils.analysis import run_analysis_suite
        from nndetection_tpu.utils.io import save_pickle

        pred_dir = tmp_path / "preds"
        gt_dir = tmp_path / "gt"
        pred_dir.mkdir()
        gt_dir.mkdir()
        gt = np.asarray([[0, 0, 10, 10, 0, 10]], np.float32)
        save_pickle(
            {
                "pred_boxes": np.asarray([[0, 0, 10, 10, 0, 10], [50, 50, 60, 60, 50, 60]]),
                "pred_scores": np.asarray([0.9, 0.6]),
                "pred_labels": np.asarray([0, 0]),
            },
            pred_dir / "case_0_boxes.pkl",
        )
        np.savez(gt_dir / "case_0_boxes_gt.npz", boxes=gt, classes=np.zeros(1))
        out = run_analysis_suite(pred_dir, gt_dir, tmp_path / "analysis", make_plots=False)
        r = out["iou_0.10_score_0.50"]
        assert r["tp"] == 1 and r["fp"] == 1 and r["fn"] == 0
        assert r["confusion"][0][0] == 1
        # per-combination subdirs carry the per-case overview + worst list
        sub = tmp_path / "analysis" / "iou_0.1_score_0.5"
        assert (sub / "analysis.json").exists()
        assert (sub / "analysis_ids.json").exists()

    def test_boxes_to_mask(self):
        from nndetection_tpu.utils.analysis import convert_boxes_to_mask

        mask, meta = convert_boxes_to_mask(
            np.asarray([[0, 0, 4, 4, 0, 4], [5, 5, 8, 8, 5, 8]], np.float32),
            np.asarray([0.9, 0.4]),
            np.asarray([0, 1]),
            shape=(10, 10, 10),
            score_thresh=0.2,
        )
        assert mask.max() == 2
        assert mask[1, 1, 1] == 1 and mask[6, 6, 6] == 2
        assert meta[2]["label"] == 1 and abs(meta[2]["score"] - 0.4) < 1e-6
