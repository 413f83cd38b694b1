"""2D model path (the reference nominally supports 2D; SURVEY §2.2)."""
import jax
import numpy as np
import jax.numpy as jnp

from nndetection_tpu.models import RetinaUNet, RetinaUNetConfig, batched_postprocess


def cfg_2d():
    return RetinaUNetConfig(
        dim=2,
        conv_kernels=((3, 3),) * 3,
        strides=((2, 2),) * 2,
        decoder_levels=(1, 2),
        patch_size=(32, 32),
        anchor_width=((4, 8), (8, 16)),
        anchor_height=((4, 8), (8, 16)),
        anchor_depth=None,
        start_channels=8,
        fpn_channels=16,
        head_channels=16,
        topk_candidates=100,
        detections_per_img=10,
        dtype="float32",
    )


class Test2D:
    def test_forward_and_postprocess(self):
        # dataclass frozen: anchor_depth=None needs special handling
        import dataclasses

        cfg = cfg_2d()
        model = RetinaUNet(cfg)
        x = jnp.zeros((1, 32, 32, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        anchors, per_level = cfg.anchors()
        assert out["box_logits"].shape == (1, anchors.shape[0], 1)
        assert out["box_deltas"].shape == (1, anchors.shape[0], 4)
        assert out["seg_logits"].shape == (1, 32, 32, 2)
        dets = batched_postprocess(cfg, out, jnp.asarray(anchors), cfg.patch_size)
        assert dets["boxes"].shape == (1, 10, 4)
