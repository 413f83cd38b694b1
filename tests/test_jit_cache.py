"""Cross-instance jitted-executable reuse (utils/jit_cache.py).

Per-fold Trainer and per-stage Predictor instances must share the SAME jitted
callable when their semantic configs match — on the real TPU a recompile
costs tens of minutes through the remote compile service and the persistent
cache does not engage, so CV training/prediction is compile-bound without
this reuse.
"""
import dataclasses

import numpy as np

from nndetection_tpu.models import RetinaUNetConfig
from nndetection_tpu.utils.jit_cache import cache_info, freeze, memo_jit


def tiny_cfg(**kw):
    base = dict(
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
    base.update(kw)
    return RetinaUNetConfig(**base)


class TestFreeze:
    def test_dataclass_key_stable_and_discriminating(self):
        a, b = tiny_cfg(), tiny_cfg()
        assert freeze(a) == freeze(b)
        assert hash(freeze(a)) == hash(freeze(b))
        c = tiny_cfg(start_channels=8)
        assert freeze(a) != freeze(c)

    def test_arrays_and_dicts(self):
        k1 = freeze({"a": np.arange(3), "b": [1, (2, 3)]})
        k2 = freeze({"b": [1, (2, 3)], "a": np.arange(3)})
        assert k1 == k2
        assert freeze({"a": np.arange(4)}) != freeze({"a": np.arange(3)})

    def test_memo_returns_same_object(self):
        built = []

        def builder():
            built.append(1)
            return object()

        k = ("test_memo", freeze(tiny_cfg()))
        first = memo_jit(k, builder)
        second = memo_jit(k, builder)
        assert first is second
        assert len(built) == 1
        assert cache_info() >= 1


class TestTrainerReuse:
    def test_same_config_shares_step(self):
        from nndetection_tpu.train.trainer import Trainer, TrainerConfig

        cfg = tiny_cfg()
        tcfg = TrainerConfig(
            batch_size=2, max_epochs=1, num_train_batches_per_epoch=2,
            num_val_batches_per_epoch=1, warm_iterations=1, swa_epochs=0,
        )
        t1 = Trainer(cfg, tcfg)
        t2 = Trainer(cfg, tcfg)  # e.g. the next CV fold
        assert t1._train_step is t2._train_step
        assert t1._val_step is t2._val_step

        # a different schedule is a different program
        tcfg3 = dataclasses.replace(tcfg, max_epochs=2)
        t3 = Trainer(cfg, tcfg3)
        assert t3._train_step is not t1._train_step

    def test_predictor_reuse(self):
        import jax

        from nndetection_tpu.inference.predictor import ModelBundle, Predictor
        from nndetection_tpu.models import RetinaUNet

        cfg = tiny_cfg()
        model = RetinaUNet(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((1, *cfg.patch_size, 1), np.float32)
        )
        b1 = ModelBundle(cfg=cfg, params=params, name="fold0")
        b2 = ModelBundle(cfg=cfg, params=params, name="fold1")
        p1 = Predictor([b1], batch_size=2, tta=False)
        p2 = Predictor([b2], batch_size=2, tta=False)  # next fold's sweep
        p3 = Predictor([b1, b2], batch_size=2, tta=False)  # ensemble predict
        assert p1._infer is p2._infer
        assert p1._infer is p3._infer
        p4 = Predictor([b1], batch_size=2, tta=True)
        assert p4._infer is not p1._infer
