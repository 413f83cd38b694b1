import numpy as np
import pytest

from nndetection_tpu.data.dataset import DatasetInfo
from nndetection_tpu.planning import (
    Planner,
    Plan,
    analytic_estimate,
    get_pool_and_conv_props,
    initial_patch_size,
    optimize_anchors,
    plan_decoder_levels,
)
from nndetection_tpu.planning.anchors_opt import anchor_set_from_params, centered_iou


class TestArchPlanning:
    def test_isotropic_pooling(self):
        pool, kernels, must_div, patch = get_pool_and_conv_props(
            (1.0, 1.0, 1.0), (128, 128, 128)
        )
        # 128 -> pools down to 4: five 2x pools
        assert len(pool) == 5
        assert all(p == [2, 2, 2] for p in pool)
        assert must_div == [32, 32, 32]
        assert all(k == [3, 3, 3] for k in kernels)

    def test_anisotropic_pooling(self):
        pool, kernels, must_div, patch = get_pool_and_conv_props(
            (4.0, 1.0, 1.0), (32, 128, 128)
        )
        # z (axis0) must not pool until its spacing is within 2x of in-plane
        assert pool[0] == [1, 2, 2]
        assert kernels[0][0] == 1  # anisotropic axis starts with kernel 1
        assert kernels[-1] == [3, 3, 3]

    def test_small_patch_limits_pooling(self):
        pool, _, must_div, _ = get_pool_and_conv_props((1, 1, 1), (16, 16, 16))
        assert len(pool) == 2  # 16 -> 8 -> 4 (min feature map 4)

    def test_decoder_levels(self):
        assert plan_decoder_levels(6) == (2, 3, 4, 5)
        assert plan_decoder_levels(5) == (1, 2, 3, 4)
        assert plan_decoder_levels(4) == (1, 2, 3)
        assert plan_decoder_levels(3) == (1, 2)

    def test_initial_patch_clipped_to_median(self):
        p = initial_patch_size((1.0, 1.0, 1.0), (100, 200, 200))
        assert p[0] == 80 or p[0] == 100  # clipped by median on axis 0 or FOV
        assert p[0] <= 100

    def test_memory_estimate_monotonic(self):
        kw = dict(
            batch_size=4,
            in_channels=1,
            conv_kernels=[[3, 3, 3]] * 5,
            strides=[[2, 2, 2]] * 4,
            decoder_levels=(1, 2, 3, 4),
        )
        small = analytic_estimate(patch_size=(64, 64, 64), **kw)
        big = analytic_estimate(patch_size=(128, 128, 128), **kw)
        assert big.total_bytes > small.total_bytes


class TestAnchorOpt:
    def test_centered_iou(self):
        a = np.asarray([[2.0, 2.0, 2.0]])
        b = np.asarray([[2.0, 2.0, 2.0], [4.0, 4.0, 4.0]])
        iou = centered_iou(a, b)
        assert iou[0, 0] == pytest.approx(1.0)
        assert iou[0, 1] == pytest.approx(8 / 64)

    def test_optimizer_recovers_sizes(self, rng):
        # boxes drawn near two distinct scales -> anchors should cover both
        sizes = np.concatenate(
            [
                rng.uniform(7, 9, (60, 3)),
                rng.uniform(20, 24, (60, 3)),
            ]
        )
        params, score = optimize_anchors(
            sizes, [[1, 1, 1], [2, 2, 2]], budget=800, restarts=1
        )
        assert score > 0.55  # mean max-IoU well above a single-scale guess

    def test_anchor_set_scaling(self):
        params = np.asarray([2, 4, 8, 2, 4, 8, 2, 4, 8], np.float64)
        s = anchor_set_from_params(params, [[1, 1, 1], [2, 2, 2]])
        assert s.shape == (54, 3)
        np.testing.assert_allclose(s[27], s[0] * 2)


class TestPlanner:
    def _props(self, rng, n_cases=10, aniso=False):
        spacing = np.asarray([3.0, 0.8, 0.8]) if aniso else np.asarray([1.0, 1.0, 1.0])
        spacings = np.tile(spacing, (n_cases, 1)) * rng.uniform(0.9, 1.1, (n_cases, 3))
        shapes = np.tile(np.asarray([64, 256, 256] if aniso else [160, 160, 160]),
                         (n_cases, 1))
        boxes = []
        for _ in range(40):
            size = rng.uniform(5, 20, 3)
            boxes.append([0, 0, size[0], size[1], 0, size[2]])
        return {
            "all_spacings": spacings,
            "all_shapes": shapes,
            "intensity_properties": {
                0: {"mean": 0.0, "sd": 1.0, "percentile_00_5": -2.0,
                    "percentile_99_5": 2.0, "min": -5.0, "max": 5.0}
            },
            "boxes_mm": np.asarray(boxes),
            "instance_classes": rng.randint(0, 2, 40),
            "per_case": {f"c{i}": {"num_instances": int(rng.randint(1, 5))}
                         for i in range(n_cases)},
        }

    def test_full_plan(self, rng):
        info = DatasetInfo(task="T", modalities={0: "CT"}, labels={0: "a", 1: "b"})
        planner = Planner(anchor_budget=400)
        plan = planner.plan_experiment(self._props(rng), info)
        assert plan.dim == 3
        assert plan.normalization_schemes == ["CT"]
        assert len(plan.conv_kernels) == len(plan.pool_strides) + 1
        assert max(plan.decoder_levels) < len(plan.conv_kernels)
        assert len(plan.anchors["width"]) == len(plan.decoder_levels)
        assert plan.mem_estimate_bytes > 0
        cfg = plan.model_config()
        anchors, per_level = cfg.anchors()
        assert anchors.shape[0] == sum(per_level)

    def test_aniso_transpose(self, rng):
        info = DatasetInfo(task="T", modalities={0: "MR"}, labels={0: "a"})
        planner = Planner(anchor_budget=200)
        plan = planner.plan_experiment(self._props(rng, aniso=True), info)
        assert plan.transpose_forward[0] == 0  # largest-spacing axis first
        assert plan.normalization_schemes == ["nonCT"]
        assert plan.use_nonzero_mask
        # anisotropic: first pool stride should not pool axis 0
        assert plan.pool_strides[0][0] == 1

    def test_memory_budget_shrinks_patch(self, rng):
        info = DatasetInfo(task="T", modalities={0: "CT"}, labels={0: "a"})
        big = Planner(anchor_budget=100).plan_experiment(self._props(rng), info)
        small = Planner(
            hbm_budget=big.mem_estimate_bytes // 3, anchor_budget=100
        ).plan_experiment(self._props(rng), info)
        assert np.prod(small.patch_size) < np.prod(big.patch_size)


class TestCompileValidate:
    """The compiled-probe final fit decision (VERDICT r1 #4)."""

    def _arch(self):
        return {
            "patch_size": [32, 32, 32],
            "pool_strides": [[2, 2, 2], [2, 2, 2]],
            "conv_kernels": [[3, 3, 3]] * 3,
            "decoder_levels": (1, 2),
            "batch_size": 8,
            "mem_estimate_bytes": 10**9,
            "mem_compiled_bytes": 0,
        }

    def test_over_budget_halves_batch(self, monkeypatch):
        from nndetection_tpu.planning import planner as pl
        from nndetection_tpu.planning.estimator import MemoryEstimate

        calls = []

        def fake_probe(cfg, batch_size, max_instances=32):
            calls.append(batch_size)
            # 2 GB per batch element: batch 8 -> 16GB (over), 4 -> 8GB (fits)
            return MemoryEstimate(batch_size * 2 * 1024**3, {})

        monkeypatch.setattr(pl, "probe_train_step_estimate", fake_probe)
        p = pl.Planner(compile_validate=True, batch_size=4)
        arch = p._compile_validate_arch(
            self._arch(), in_channels=1, num_classes=1,
            target_spacing=np.ones(3),
        )
        # first call probes the no-remat variant (over budget here), then the
        # remat loop: batch 8 over -> halve -> batch 4 fits
        assert calls == [8, 8, 4]
        assert arch["batch_size"] == 4
        assert arch.get("remat", True) is True
        assert arch["mem_compiled_bytes"] == 4 * 2 * 1024**3

    def test_no_remat_when_probe_fits(self, monkeypatch):
        from nndetection_tpu.planning import planner as pl
        from nndetection_tpu.planning.estimator import MemoryEstimate

        seen_remat = []

        def fake_probe(cfg, batch_size, max_instances=32):
            seen_remat.append(cfg.remat)
            return MemoryEstimate(2 * 1024**3, {})  # always fits

        monkeypatch.setattr(pl, "probe_train_step_estimate", fake_probe)
        p = pl.Planner(compile_validate=True, batch_size=4)
        arch = p._compile_validate_arch(
            self._arch(), in_channels=1, num_classes=1,
            target_spacing=np.ones(3),
        )
        assert seen_remat == [False]  # no-remat probe fit -> done in one call
        assert arch["remat"] is False

    def test_base_batch_over_budget_shrinks_patch(self, monkeypatch):
        from nndetection_tpu.planning import planner as pl
        from nndetection_tpu.planning.estimator import MemoryEstimate

        def fake_probe(cfg, batch_size, max_instances=32):
            # always over budget -> batch halves to base, then patch shrinks
            return MemoryEstimate(10**12, {})

        monkeypatch.setattr(pl, "probe_train_step_estimate", fake_probe)
        p = pl.Planner(compile_validate=True, batch_size=4)
        start = self._arch()
        arch = p._compile_validate_arch(
            dict(start), in_channels=1, num_classes=1,
            target_spacing=np.ones(3),
        )
        assert arch["batch_size"] == 4
        assert np.prod(arch["patch_size"]) < np.prod(start["patch_size"])

    def test_disabled_and_unavailable_keep_plan(self, monkeypatch):
        from nndetection_tpu.planning import planner as pl

        p = pl.Planner(compile_validate=False)
        arch = p._compile_validate_arch(
            self._arch(), 1, 1, target_spacing=np.ones(3)
        )
        assert arch["batch_size"] == 8
        monkeypatch.setattr(
            pl, "probe_train_step_estimate", lambda *a, **k: None
        )
        p2 = pl.Planner(compile_validate=True)
        arch2 = p2._compile_validate_arch(
            self._arch(), 1, 1, target_spacing=np.ones(3)
        )
        assert arch2["batch_size"] == 8

    def test_probe_compiles_on_cpu_or_returns_none(self):
        """The probe itself must never raise — on CPU it either yields an
        analysis or None."""
        from nndetection_tpu.planning.estimator import probe_train_step_estimate
        from nndetection_tpu.planning import planner as pl

        p = pl.Planner()
        cfg = p._proxy_model_config(self._arch(), in_channels=1, num_classes=1)
        est = probe_train_step_estimate(cfg, batch_size=1, max_instances=4)
        assert est is None or est.total_bytes > 0


class TestRematPlanning:
    def test_plan_remat_threads_into_model_config(self):
        """`Plan.remat` must reach the architecture config (the compile probe
        turns remat off when the no-remat step fits HBM)."""
        from nndetection_tpu.planning.planner import Plan

        kw = dict(
            plan_id="t", dim=3, target_spacing=[1, 1, 1],
            transpose_forward=[0, 1, 2], normalization_schemes=["nonCT"],
            intensity_properties={}, use_nonzero_mask=False,
            patch_size=[32, 32, 32], batch_size=2,
            conv_kernels=[[3, 3, 3]] * 4, pool_strides=[[2, 2, 2]] * 3,
            decoder_levels=(1, 2, 3),
            anchors={"width": [[4.0, 6.0]] * 3, "height": [[4.0, 6.0]] * 3,
                     "depth": [[4.0, 6.0]] * 3},
            in_channels=1, num_classes=1, seg_classes=1,
        )
        assert Plan(**kw).model_config().remat is True
        assert Plan(**kw, remat=False).model_config().remat is False

    def test_old_pickles_default_remat(self, tmp_path):
        """Plans pickled before the field existed must read remat=True via
        the dataclass class attribute."""
        import pickle

        from nndetection_tpu.planning.planner import Plan

        p = Plan(
            plan_id="t", dim=3, target_spacing=[1, 1, 1],
            transpose_forward=[0, 1, 2], normalization_schemes=["nonCT"],
            intensity_properties={}, use_nonzero_mask=False,
            patch_size=[32, 32, 32], batch_size=2,
            conv_kernels=[[3, 3, 3]] * 4, pool_strides=[[2, 2, 2]] * 3,
            decoder_levels=(1, 2, 3),
            anchors={"width": [[4.0]] * 3, "height": [[4.0]] * 3,
                     "depth": [[4.0]] * 3},
            in_channels=1, num_classes=1, seg_classes=1,
        )
        blob = pickle.dumps(p)
        restored = pickle.loads(blob)
        del restored.__dict__["remat"]  # simulate a pre-field pickle
        assert restored.remat is True
        assert restored.model_config().remat is True


class TestForcedPatchSpatial:
    """Planner-selected spatial partitioning (VERDICT r2 #6): a user-pinned
    patch that exceeds single-chip HBM plans ``n_model`` in {2,4} instead of
    shrinking."""

    SPACING = np.ones(3)
    MEDIAN = np.asarray([96.0, 192.0, 192.0])

    def _arch(self, force, budget=None, max_model_axis=4):
        kw = dict(force_patch_size=force, compile_validate=False,
                  max_model_axis=max_model_axis)
        if budget is not None:
            kw["hbm_budget"] = budget
        planner = Planner(**kw)
        return planner.plan_architecture(self.SPACING, self.MEDIAN, 1, 1)

    def test_fitting_patch_stays_single_chip(self):
        arch = self._arch((32, 64, 64))
        assert arch["n_model"] == 1
        assert arch["patch_size"][1:] == [64, 64]

    def test_oversized_patch_gets_model_axis(self):
        ref = self._arch((64, 160, 160))
        assert ref["n_model"] == 1
        arch = self._arch((64, 160, 160),
                          budget=int(ref["mem_estimate_bytes"] * 0.7))
        assert arch["n_model"] == 2
        # the patch was preserved (possibly z-rounded up), never shrunk
        assert arch["patch_size"][0] >= 64
        assert arch["patch_size"][1:] == [160, 160]
        # trainer's shardability contract holds for the emitted plan
        from nndetection_tpu.train.trainer import Trainer

        planner = Planner(compile_validate=False)
        cfg = planner._proxy_model_config(arch, 1, 1)
        Trainer._check_spatial_shardable(cfg, arch["n_model"])  # no raise

    def test_impossible_patch_raises(self):
        ref = self._arch((64, 160, 160))
        with pytest.raises(ValueError, match="spatially partitioned"):
            self._arch((64, 160, 160),
                       budget=int(ref["mem_estimate_bytes"] * 0.01),
                       max_model_axis=2)

    def test_plan_experiment_carries_n_model(self, rng):
        info = DatasetInfo(task="T", modalities={0: "CT"}, labels={0: "a"})
        props = TestPlanner._props(TestPlanner(), rng)
        ref = Planner(
            anchor_budget=50, force_patch_size=(64, 160, 160),
            compile_validate=False,
        ).plan_experiment(props, info)
        assert getattr(ref, "n_model", 1) == 1
        plan = Planner(
            anchor_budget=50, force_patch_size=(64, 160, 160),
            compile_validate=False,
            hbm_budget=int(ref.mem_estimate_bytes * 0.7),
        ).plan_experiment(props, info)
        assert plan.n_model == 2

    def test_mesh_for_plan(self):
        import dataclasses

        import jax

        from nndetection_tpu.pipeline import mesh_for_plan

        ref_arch = self._arch((64, 160, 160))
        arch = self._arch((64, 160, 160),
                          budget=int(ref_arch["mem_estimate_bytes"] * 0.7))
        plan = Plan(
            plan_id="T", dim=3, target_spacing=[1, 1, 1],
            transpose_forward=[0, 1, 2], normalization_schemes=["CT"],
            intensity_properties={}, use_nonzero_mask=False,
            patch_size=arch["patch_size"], batch_size=4,
            conv_kernels=arch["conv_kernels"],
            pool_strides=arch["pool_strides"],
            decoder_levels=arch["decoder_levels"],
            anchors={"width": [[4.0]], "height": [[4.0]], "depth": [[4.0]]},
            in_channels=1, num_classes=1, seg_classes=1,
            n_model=arch["n_model"],
        )
        mesh = mesh_for_plan(plan, batch_size=4)
        assert mesh is not None
        assert dict(zip(mesh.axis_names, mesh.devices.shape))["model"] == 2
        single = dataclasses.replace(plan, n_model=1)
        assert mesh_for_plan(single, batch_size=4) is None
