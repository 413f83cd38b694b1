import jax
import numpy as np
import jax.numpy as jnp

from nndetection_tpu.losses import deep_supervision_seg_loss, maxpool_downsample_target
from nndetection_tpu.models import RetinaUNet, RetinaUNetConfig, train_step_loss
from tests.test_model import make_batch, tiny_cfg


class TestMaxpoolTarget:
    def test_downsample_preserves_fg(self):
        t = np.zeros((1, 8, 8, 8), np.int32)
        t[0, 3, 3, 3] = 1
        out = np.asarray(maxpool_downsample_target(jnp.asarray(t), 2))
        assert out.shape == (1, 4, 4, 4)
        assert out[0, 1, 1, 1] == 1
        assert out.sum() == 1


class TestDeepSupervision:
    def test_model_and_loss(self):
        cfg = tiny_cfg(segmenter_deep_supervision=True, seg_supervision_levels=2)
        model = RetinaUNet(cfg)
        rng = np.random.default_rng(0)
        batch = make_batch(cfg, rng)
        params = model.init(jax.random.PRNGKey(0), batch["images"])
        preds = model.apply(params, batch["images"])
        assert "seg_logits_aux1" in preds
        assert preds["seg_logits_aux1"].shape[1] == cfg.patch_size[0] // 2
        anchors_np, per_level = cfg.anchors()
        losses = train_step_loss(
            cfg, preds, jnp.asarray(anchors_np), per_level, batch, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(losses["seg_ce"]))
