"""Pickle schema guards: old-schema plans migrate (or fail loudly by field
name), foreign/truncated checkpoints are rejected at the load site
(VERDICT r3 #9 — replaces the silent `getattr(plan, 'n_model', 1)` drift)."""
import pickle

import pytest

from nndetection_tpu.planning.planner import PLAN_SCHEMA_VERSION, Plan


def make_plan(**overrides):
    kw = dict(
        plan_id="D3V001_3d",
        dim=3,
        target_spacing=[1.0, 1.0, 1.0],
        transpose_forward=[0, 1, 2],
        normalization_schemes=["CT"],
        intensity_properties={},
        use_nonzero_mask=False,
        patch_size=[16, 16, 16],
        batch_size=2,
        conv_kernels=[[3, 3, 3]] * 3,
        pool_strides=[[2, 2, 2]] * 2,
        decoder_levels=(1, 2),
        anchors={"width": [[6.0]] * 2, "height": [[6.0]] * 2, "depth": [[6.0]] * 2},
        in_channels=1,
        num_classes=1,
        seg_classes=1,
    )
    kw.update(overrides)
    return Plan(**kw)


class TestPlanSchemaGuard:
    def test_roundtrip_current_schema(self):
        plan = make_plan(n_model=2)
        restored = pickle.loads(pickle.dumps(plan))
        assert restored.n_model == 2
        assert restored.schema_version == PLAN_SCHEMA_VERSION

    def test_old_pickle_missing_defaulted_field_migrates(self, caplog):
        """A plan saved before `n_model`/`schema_version` existed: the state
        dict lacks those keys entirely (pickle restores __dict__ without
        __init__). Migration must fill the defaults and log."""
        plan = make_plan()
        state = dict(plan.__dict__)
        del state["n_model"]
        del state["schema_version"]
        del state["remat"]
        raw = pickle.dumps(plan)
        restored = pickle.loads(raw)
        restored.__dict__.clear()
        import logging

        with caplog.at_level(logging.WARNING, logger="nndet"):
            restored.__setstate__(dict(state))
        assert restored.n_model == 1
        assert restored.remat is True
        assert restored.schema_version == PLAN_SCHEMA_VERSION
        assert any("migrated plan pickle" in r.message for r in caplog.records)

    def test_old_pickle_missing_required_field_fails_loudly(self):
        plan = make_plan()
        state = dict(plan.__dict__)
        del state["patch_size"]
        fresh = object.__new__(Plan)
        with pytest.raises(ValueError, match="patch_size"):
            fresh.__setstate__(state)

    def test_newer_schema_rejected(self):
        plan = make_plan()
        state = dict(plan.__dict__, schema_version=PLAN_SCHEMA_VERSION + 1)
        fresh = object.__new__(Plan)
        with pytest.raises(ValueError, match="schema_version"):
            fresh.__setstate__(state)


class TestCheckpointSchemaGuard:
    def test_missing_fields_fail_loudly(self, tmp_path):
        from nndetection_tpu.utils.io import save_pickle

        path = tmp_path / "model_last.ckpt"
        save_pickle({"params": {}, "step": 3}, path)

        class FakeTrainer:
            from nndetection_tpu.train.trainer import Trainer as _T

            load_checkpoint = _T.load_checkpoint

        with pytest.raises(ValueError, match="opt_state"):
            FakeTrainer().load_checkpoint(path)

    def test_newer_ckpt_rejected(self, tmp_path):
        from nndetection_tpu.train.trainer import CKPT_SCHEMA_VERSION, Trainer
        from nndetection_tpu.utils.io import save_pickle

        path = tmp_path / "model_last.ckpt"
        save_pickle(
            {
                "schema_version": CKPT_SCHEMA_VERSION + 1,
                "params": {}, "opt_state": {}, "step": 0,
                "swa_params": {}, "swa_count": 0,
            },
            path,
        )

        class FakeTrainer:
            load_checkpoint = Trainer.load_checkpoint

        with pytest.raises(ValueError, match="schema_version"):
            FakeTrainer().load_checkpoint(path)
