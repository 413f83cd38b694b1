"""End-to-end pipeline orchestration: prep -> train -> sweep -> consolidate ->
predict -> evaluate.

Directory contract identical to the reference (SURVEY.md §1 dataflow):
``raw_splitted -> raw_cropped -> preprocessed/{plan}/ ->
{det_models}/Task/Model/foldX -> consolidated -> test_predictions``.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from nndetection_tpu.data.augment import (
    AugmentConfig,
    generator_patch_size_for,
    get_generator_patch_size,
)
from nndetection_tpu.data.dataset import DatasetInfo, discover_cases
from nndetection_tpu.data.loader import (
    DevicePatchPool,
    PatchLoader,
    PrefetchIterator,
    build_case_records,
)
from nndetection_tpu.data.preprocess import (
    analyze_dataset,
    process_case,
    run_cropping,
    unpack_dataset,
)
from nndetection_tpu.evaluator.registry import evaluate_box_dir
from nndetection_tpu.inference.ensembler import BOX_ENSEMBLERS
from nndetection_tpu.inference.loading import load_all_models, load_model_bundle
from nndetection_tpu.inference.predictor import ModelBundle, Predictor
from nndetection_tpu.inference.sweeper import BoxSweeper
from nndetection_tpu.planning.planner import Plan, Planner
from nndetection_tpu.train.trainer import Trainer, TrainerConfig
from nndetection_tpu.utils.io import (
    load_pickle,
    save_json,
    save_pickle,
)

NUM_FOLDS = 5
SPLIT_SEED = 12345


# ---------------------------------------------------------------------------
# prep
# ---------------------------------------------------------------------------
def run_prep(
    task_dir,
    num_workers: int = 0,
    planner: Optional[Planner] = None,
) -> Plan:
    """crop -> analyze -> plan -> process (``scripts/preprocess.py:46-413``)."""
    task_dir = Path(task_dir)
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    splitted = task_dir / "raw_splitted"
    cropped_dir = task_dir / "raw_cropped"
    prep_dir = task_dir / "preprocessed"

    cases = discover_cases(
        splitted / "imagesTr", splitted / "labelsTr", info.num_modalities
    )
    if not cases:
        raise FileNotFoundError(f"no training cases in {splitted / 'imagesTr'}")
    run_cropping(cases, cropped_dir, num_workers=num_workers)

    case_ids = [c.case_id for c in cases]
    props = analyze_dataset(
        cropped_dir, case_ids, info.num_modalities, num_workers=num_workers
    )
    (prep_dir / "properties").mkdir(parents=True, exist_ok=True)
    save_pickle(props, prep_dir / "properties" / "dataset_properties.pkl")

    planner = planner or Planner()
    plan = planner.plan_experiment(props, info)
    save_pickle(plan, prep_dir / f"{plan.plan_id}.pkl")

    plan_dir = prep_dir / plan.plan_id
    out_images = plan_dir / "imagesTr"
    out_labels = plan_dir / "labelsTr"
    for cid in case_ids:
        process_case(
            cropped_dir,
            out_images,
            out_labels,
            cid,
            target_spacing=np.asarray(plan.target_spacing),
            transpose_forward=plan.transpose_forward,
            normalization_schemes=plan.normalization_schemes,
            intensity_properties=plan.intensity_properties,
            use_nonzero_mask=plan.use_nonzero_mask,
        )
    # corrupted-file detector: re-load every processed case and regenerate
    # failures (reference ``scripts/preprocess.py:210-295``)
    from nndetection_tpu.utils.io import load_npz_looped

    for cid in case_ids:
        try:
            load_npz_looped(out_images / f"{cid}.npz", keys=["data"])
        except Exception:  # noqa: BLE001 — regenerate single-process
            process_case(
                cropped_dir, out_images, out_labels, cid,
                target_spacing=np.asarray(plan.target_spacing),
                transpose_forward=plan.transpose_forward,
                normalization_schemes=plan.normalization_schemes,
                intensity_properties=plan.intensity_properties,
                use_nonzero_mask=plan.use_nonzero_mask,
            )
    unpack_dataset(out_images)

    # low-resolution fallback stage when the largest objects exceed the patch
    # (``v001.py:186-210``): derive, save and preprocess the `3dlr1` plan
    if plan.requires_lowres:
        plan_lr = planner.plan_lowres(plan, props, info)
        save_pickle(plan_lr, prep_dir / f"{plan_lr.plan_id}.pkl")
        lr_images = prep_dir / plan_lr.plan_id / "imagesTr"
        lr_labels = prep_dir / plan_lr.plan_id / "labelsTr"
        for cid in case_ids:
            process_case(
                cropped_dir, lr_images, lr_labels, cid,
                target_spacing=np.asarray(plan_lr.target_spacing),
                transpose_forward=plan_lr.transpose_forward,
                normalization_schemes=plan_lr.normalization_schemes,
                intensity_properties=plan_lr.intensity_properties,
                use_nonzero_mask=plan_lr.use_nonzero_mask,
            )
        unpack_dataset(lr_images)

    make_splits(case_ids, prep_dir / "splits_final.pkl")
    return plan


def make_splits(case_ids: Sequence[str], path, num_folds: int = NUM_FOLDS) -> List[Dict]:
    """Deterministic K-fold split (``splits_final.pkl`` contract)."""
    path = Path(path)
    if path.exists():
        return load_pickle(path)
    rng = np.random.RandomState(SPLIT_SEED)
    ids = np.asarray(sorted(case_ids))
    perm = rng.permutation(len(ids))
    folds = np.array_split(perm, num_folds)
    splits = []
    for k in range(num_folds):
        val = set(folds[k].tolist())
        splits.append(
            {
                "train": [str(ids[i]) for i in range(len(ids)) if i not in val],
                "val": [str(ids[i]) for i in sorted(val)],
            }
        )
    save_pickle(splits, path)
    return splits


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------
def build_loaders(
    plan: Plan,
    image_dir,
    splits: List[Dict],
    fold: int,
    batch_size: int,
    oversample: float = 0.5,
    augment: bool = True,
    seed: int = 0,
    aug_cfg: Optional[AugmentConfig] = None,
    device_pool: Any = "auto",
    pool_hbm_budget: int = 4 * 1024**3,
    num_epochs_hint: Optional[int] = None,
):
    """``device_pool``: keep training cases resident in HBM and extract
    patches on device (:class:`DevicePatchPool`) — zero per-step host
    transfers. ``"auto"`` enables it on TPU backends; the pool size is capped
    by ``pool_hbm_budget`` (excess cases rotate in via per-epoch swaps)."""
    records = build_case_records(image_dir)
    by_id = {r.case_id: r for r in records}
    if fold == -1:
        train_ids = sorted(by_id)
        val_ids = sorted(by_id)
    else:
        train_ids = [c for c in splits[fold]["train"] if c in by_id]
        val_ids = [c for c in splits[fold]["val"] if c in by_id]
    if not augment:
        gen_patch = tuple(plan.patch_size)
    elif aug_cfg is not None:
        gen_patch = generator_patch_size_for(aug_cfg)
    else:
        gen_patch = get_generator_patch_size(plan.patch_size)

    if device_pool == "auto":
        import jax

        device_pool = jax.default_backend() == "tpu"
    train_records = [by_id[c] for c in train_ids]
    if device_pool:
        dim = len(gen_patch)
        max_shape = [
            max(max(r.shape[d] for r in train_records), gen_patch[d])
            for d in range(dim)
        ]
        per_case = int(np.prod(max_shape)) * (2 * plan.in_channels + 2)
        max_cases = max(2, int(pool_hbm_budget // max(per_case, 1)))
        train_loader = DevicePatchPool(
            train_records,
            patch_size=gen_patch,
            batch_size=batch_size,
            max_pool_cases=max_cases,
            num_epochs_hint=num_epochs_hint,
            oversample_foreground_percent=oversample,
            max_instances=plan.max_instances_per_patch,
            seed=seed,
            inner_patch_size=tuple(plan.patch_size),
        )
    else:
        train_loader = PatchLoader(
            train_records,
            patch_size=gen_patch,
            batch_size=batch_size,
            oversample_foreground_percent=oversample,
            max_instances=plan.max_instances_per_patch,
            seed=seed,
            inner_patch_size=tuple(plan.patch_size),
        )
    val_loader = PatchLoader(
        [by_id[c] for c in val_ids] or [by_id[c] for c in train_ids],
        patch_size=tuple(plan.patch_size),
        batch_size=batch_size,
        oversample_foreground_percent=oversample,
        max_instances=plan.max_instances_per_patch,
        seed=seed + 1,
        # identical val patches every epoch: per-epoch metrics compare the
        # model, not the sample (model_best selection on signal)
        fixed_sequence=True,
    )
    return train_loader, val_loader


def mesh_for_plan(plan: Plan, batch_size: int):
    """Build the device mesh a plan asks for. Plans with ``n_model > 1``
    (planner-selected spatial partitioning: the pinned patch exceeded
    single-chip HBM) get a (data, model) mesh; others return ``None`` and the
    trainer builds its default data-parallel mesh. ``getattr``: plan pickles
    from before the field default to 1."""
    n_model = plan.n_model
    if n_model <= 1:
        return None
    import math

    import jax

    from nndetection_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < n_model:
        raise RuntimeError(
            f"plan requires a model-axis of {n_model} but only "
            f"{n_dev} device(s) are visible"
        )
    n_data = math.gcd(batch_size, max(1, n_dev // n_model))
    return make_mesh(n_data=n_data, n_model=n_model)


def run_train(
    task_dir,
    model_dir,
    fold: int = 0,
    trainer_overrides: Optional[Dict[str, Any]] = None,
    model_overrides: Optional[Dict[str, Any]] = None,
    plan_id: str = "D3V001_3d",
    module: str = "RetinaUNetV001",
    augment: bool = True,
    augmentation: str = "base_more",
    oversample: float = 0.5,
    log_fn=None,
    resume: bool = False,
    stop_after_epoch: Optional[int] = None,
) -> Path:
    """Train one fold; writes ``model_last.ckpt``/``model_best.ckpt`` + plan
    (``scripts/train.py:166-327``). With ``resume=True`` an existing
    ``model_last.ckpt`` continues from its next epoch (reference
    ``train.mode=resume``, ``/root/reference/scripts/train.py:154-163``)."""
    from nndetection_tpu import modules as _modules  # registers variants
    from nndetection_tpu.evaluator.det import BoxEvaluator
    from nndetection_tpu.parallel import distributed
    from nndetection_tpu.utils.registry import MODULE_REGISTRY
    from nndetection_tpu.utils.tracking import RunTracker

    # multi-host SPMD (SURVEY.md §5.8): join the job described by
    # NNDET_COORDINATOR/NNDET_NUM_PROCESSES/NNDET_PROCESS_ID (no-op when
    # unset); must run before the first backend touch below
    distributed.initialize_from_env()

    task_dir, model_dir = Path(task_dir), Path(model_dir)
    prep_dir = task_dir / "preprocessed"
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    splits = make_splits(
        [p.stem for p in (prep_dir / plan.plan_id / "imagesTr").glob("*.npz")],
        prep_dir / "splits_final.pkl",
    )

    tkw = dict(trainer_overrides or {})
    batch_size = tkw.pop("batch_size", None) or plan.batch_size
    tcfg = TrainerConfig(batch_size=batch_size, **tkw)
    module_cls = MODULE_REGISTRY[module]
    model_cfg = module_cls.model_config(plan, **(model_overrides or {}))

    out_dir = model_dir / f"fold{fold}"
    out_dir.mkdir(parents=True, exist_ok=True)
    # host-side artifacts belong to process 0 (the trainer gates its own
    # checkpoints/epoch logs the same way)
    if distributed.is_main_process():
        save_pickle(plan, out_dir / "plan.pkl")
    tracker = RunTracker(
        out_dir,
        params={"module": module, "plan": plan_id, "fold": fold,
                "trainer": tkw, "batch_size": batch_size},
        tags={"task": task_dir.name},
    ) if distributed.is_main_process() else None

    from nndetection_tpu.data.aug_presets import get_augmentation

    aug_cfg = get_augmentation(
        augmentation if augment else "no_aug",
        tuple(plan.patch_size),
        dummy_2d=plan.do_dummy_2d,
        mask_norm_zero=plan.use_nonzero_mask,
    )
    mesh = mesh_for_plan(plan, batch_size)
    trainer = Trainer(
        model_cfg, tcfg, mesh=mesh, output_dir=out_dir, augment_cfg=aug_cfg
    )
    # size the device patch pool from what the compiled step leaves free:
    # the XLA memory analysis (plan.mem_compiled_bytes) is the step's peak;
    # pool cases are additional live buffers on the same chip
    import os as _os

    pool_budget = 4 * 1024**3
    if _os.environ.get("NNDET_POOL_BYTES"):
        pool_budget = int(_os.environ["NNDET_POOL_BYTES"])
    compiled = int(plan.mem_compiled_bytes or 0)
    if compiled and not _os.environ.get("NNDET_POOL_BYTES"):
        from nndetection_tpu.planning.estimator import V5E_HBM_BYTES

        # the probe ran at plan.batch_size. Scale the footprint UP when
        # training at a larger batch, but never DOWN for a smaller one:
        # measured on hardware, a batch-4 step against a batch-8 probe of
        # 12.6 GB still OOM'd with the linearly-scaled (6.3 GB) estimate
        # even behind a 4 GB pool — XLA's real peak (fusion working sets,
        # padding, both train and val executables resident) does not shrink
        # linearly with batch. Keep a reserve for fragmentation on top.
        compiled = int(compiled * max(1.0, batch_size / max(plan.batch_size, 1)))
        reserve = max(3 << 29, compiled // 4)
        free = int(V5E_HBM_BYTES * 0.92) - compiled - reserve
        pool_budget = max(1 << 29, min(pool_budget, free))
    # under multi-process SPMD every process loads its LOCAL share of the
    # global batch (shard_batch assembles the global array via
    # make_array_from_process_local_data); decorrelate sampling per process
    local_bs = distributed.local_batch_size(batch_size)
    train_loader, val_loader = build_loaders(
        plan,
        prep_dir / plan.plan_id / "imagesTr",
        splits,
        fold,
        local_bs,
        oversample=oversample,
        augment=augment,
        seed=tcfg.seed + fold + 10007 * distributed.process_index(),
        aug_cfg=aug_cfg if augment else None,
        pool_hbm_budget=pool_budget,
        num_epochs_hint=tcfg.max_epochs + tcfg.swa_epochs,
    )
    classes = [str(info.labels[k]) for k in sorted(info.labels)]

    def _log(epoch, metrics):
        if hasattr(train_loader, "sampling_report"):
            metrics = {**metrics, **train_loader.sampling_report()}
        if tracker is not None:
            tracker.log_metrics(epoch, metrics)
        if log_fn:
            log_fn(epoch, metrics)

    start_epoch, state, best_score = 0, None, -np.inf
    last_ckpt = out_dir / "model_last.ckpt"
    if resume and last_ckpt.exists():
        payload = load_pickle(last_ckpt)
        extra = payload.get("extra", {})
        state = trainer.load_checkpoint(last_ckpt)
        start_epoch = int(extra.get("epoch", -1)) + 1
        best_score = float(extra.get("best_score", -np.inf))

    trainer.fit(
        # background-thread prefetch overlaps host patch assembly with the
        # device step (the reference's MultiThreadedAugmenter role)
        train_iter_fn=lambda e: PrefetchIterator(
            train_loader.epoch(tcfg.num_train_batches_per_epoch), depth=2
        ),
        val_iter_fn=lambda e: PrefetchIterator(
            val_loader.epoch(tcfg.num_val_batches_per_epoch), depth=2
        ),
        evaluator_fn=lambda: BoxEvaluator.create(classes, fast=True),
        log_fn=_log,
        start_epoch=start_epoch,
        state=state,
        best_score=best_score,
        stop_after_epoch=stop_after_epoch,
    )
    return out_dir


# ---------------------------------------------------------------------------
# predict / sweep / consolidate / evaluate
# ---------------------------------------------------------------------------
def predict_dir(
    bundles: Sequence[ModelBundle],
    image_dir,
    output_dir,
    case_ids: Optional[Sequence[str]] = None,
    tta: bool = True,
    save_state: bool = False,
    restore: bool = False,
    ensembler_parameters: Optional[Dict[str, Any]] = None,
    batch_size: int = 4,
    predict_seg: bool = False,
    ensembler: str = "BoxEnsemblerSelective",
    resume: bool = False,
) -> None:
    """Predict all preprocessed cases in a directory
    (``/root/reference/nndet/inference/helper.py:30-111``).

    ``resume=False`` (default) always re-predicts, matching the reference
    helper — so re-running after retraining or changing ensembler
    parameters never silently reuses stale predictions. Wall-clock-bounded
    drivers (sweeps) pass ``resume=True`` to skip completed cases.
    """
    image_dir, output_dir = Path(image_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    predictor = Predictor(
        bundles,
        batch_size=batch_size,
        tta=tta,
        ensembler_parameters=ensembler_parameters,
        predict_seg=predict_seg,
        ensembler=ensembler,
    )
    if case_ids is None:
        case_ids = sorted(
            p.stem for p in image_dir.glob("*.npz") if not p.stem.endswith("_boxes")
        )
    for cid in case_ids:
        # resume-safe: a wall-clock-killed predict/sweep stage must not redo
        # completed cases. The boxes pickle is written LAST for a case (after
        # ensembler state and seg) and atomically (utils/io.py::_atomic_write),
        # so its presence implies the case is complete.
        if resume and (output_dir / f"{cid}_boxes.pkl").exists():
            continue
        arr = np.load(image_dir / f"{cid}.npy", mmap_mode="r") if (
            image_dir / f"{cid}.npy"
        ).exists() else np.load(image_dir / f"{cid}.npz")["data"]
        data = np.asarray(arr[:-1], np.float32)
        props = load_pickle(image_dir / f"{cid}.pkl") if (
            image_dir / f"{cid}.pkl"
        ).exists() else {}
        t0 = time.time()
        result = predictor.predict_case(data, props, restore=restore)
        ens = result.pop("ensembler")
        if save_state:
            ens.save_state(output_dir, cid)
        # seg is written BEFORE the boxes pickle: boxes.pkl is the completion
        # marker for resume, so every other per-case output must exist first.
        if predict_seg and "pred_seg" in result:
            seg = result["pred_seg"]
            if restore and props:
                from nndetection_tpu.inference.restore import restore_fmap

                seg = restore_fmap(
                    seg,
                    transpose_forward=props.get("transpose_forward", [0, 1, 2]),
                    original_shape_cropped=props.get(
                        "shape_after_crop", seg.shape
                    ),
                    original_shape=props.get("shape_before_crop", seg.shape),
                    crop_bbox=props.get("crop_bbox"),
                )
            np.savez_compressed(output_dir / f"{cid}_seg.npz", seg=seg)
        save_pickle(
            {
                "pred_boxes": result["pred_boxes"],
                "pred_scores": result["pred_scores"],
                "pred_labels": result["pred_labels"],
                "restored": bool(restore),
                "prediction_time_s": time.time() - t0,
            },
            output_dir / f"{cid}_boxes.pkl",
        )


def run_sweep(
    task_dir, model_dir, fold: int, plan_id: str = "D3V001_3d", tta: bool = True
) -> Dict[str, Any]:
    """Predict the fold's val split (with state saving) and sweep
    postprocessing parameters (``scripts/train.py:330-402``)."""
    task_dir, model_dir = Path(task_dir), Path(model_dir)
    prep_dir = task_dir / "preprocessed"
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    fold_dir = model_dir / f"fold{fold}"
    bundle = load_model_bundle(fold_dir / "model_last.ckpt", name=f"fold{fold}")
    splits = make_splits([], prep_dir / "splits_final.pkl")
    val_ids = splits[fold]["val"]

    sweep_dir = fold_dir / "sweep"
    # resume=True is safe here: sweep predictions are raw ensembler states
    # (parameters are applied AFTER, by the sweeper), so a completed case
    # never goes stale when sweep parameters change. They DO go stale when
    # TRAINING advances past them — drop any state predicted before the
    # checkpoint being swept was written, or a resumed sweep would mix
    # predictions from different model versions.
    ckpt_mtime = (fold_dir / "model_last.ckpt").stat().st_mtime
    if sweep_dir.exists():
        for stale in list(sweep_dir.glob("*_boxes.pkl")) + list(
            sweep_dir.glob("*_boxes_state.pkl")
        ):
            if stale.stat().st_mtime < ckpt_mtime:
                stale.unlink()
    predict_dir(
        [bundle],
        prep_dir / plan.plan_id / "imagesTr",
        sweep_dir,
        case_ids=val_ids,
        tta=tta,
        save_state=True,
        batch_size=plan.batch_size,
        resume=True,
    )
    classes = [str(info.labels[k]) for k in sorted(info.labels)]
    sweeper = BoxSweeper(
        classes,
        state_dir=sweep_dir,
        gt_dir=prep_dir / plan.plan_id / "labelsTr",
        save_dir=fold_dir,
    )
    return sweeper.run_postprocessing_sweep()


def run_consolidate(
    task_dir, model_dir, num_folds: int = NUM_FOLDS, plan_id: str = "D3V001_3d"
) -> Path:
    """Copy fold checkpoints + unified sweep into ``consolidated/``
    (``scripts/consolidate.py:36-227``)."""
    import shutil

    task_dir, model_dir = Path(task_dir), Path(model_dir)
    out = model_dir / "consolidated"
    out.mkdir(parents=True, exist_ok=True)
    state_dir = out / "sweep_states"
    state_dir.mkdir(exist_ok=True)
    for fold in range(num_folds):
        fold_dir = model_dir / f"fold{fold}"
        ckpt = fold_dir / "model_last.ckpt"
        if ckpt.exists():
            shutil.copy(ckpt, out / f"model_fold{fold}.ckpt")
        for st in (fold_dir / "sweep").glob("*_boxes_state.pkl"):
            shutil.copy(st, state_dir / st.name)
        if (fold_dir / "plan.pkl").exists():
            shutil.copy(fold_dir / "plan.pkl", out / "plan.pkl")

    prep_dir = task_dir / "preprocessed"
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    classes = [str(info.labels[k]) for k in sorted(info.labels)]
    if any(state_dir.glob("*_boxes_state.pkl")):
        sweeper = BoxSweeper(
            classes,
            state_dir=state_dir,
            gt_dir=prep_dir / plan.plan_id / "labelsTr",
            save_dir=out,
        )
        sweeper.run_postprocessing_sweep()
    return out


def run_predict_val(
    task_dir,
    model_dir,
    fold: int,
    plan_id: str = "D3V001_3d",
    tta: bool = True,
    restore: bool = True,
    ensembler: str = "BoxEnsemblerSelective",
    resume: bool = False,
) -> Path:
    """Predict one fold's validation split with that fold's model, restored to
    the original image geometry — the cross-validation prediction mode used
    for LUNA-style FROC/CPM scoring (the reference's LUNA16 result is CV:
    ``/root/reference/docs/results/nnDetectionV001.md:107``). Uses the
    consolidated swept parameters when present."""
    task_dir, model_dir = Path(task_dir), Path(model_dir)
    prep_dir = task_dir / "preprocessed"
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    fold_dir = model_dir / f"fold{fold}"
    bundle = load_model_bundle(fold_dir / "model_last.ckpt", name=f"fold{fold}")
    splits = make_splits([], prep_dir / "splits_final.pkl")
    params = None
    params_mtime = None
    for plan_inf in (
        model_dir / "consolidated" / "plan_inference.pkl",
        fold_dir / "plan_inference.pkl",
    ):
        if plan_inf.exists():
            params = load_pickle(plan_inf)["parameters"]
            params_mtime = plan_inf.stat().st_mtime
            break
    out = fold_dir / "val_predictions"
    if resume and params_mtime is not None and out.exists():
        # Staleness guard: predictions materialized before the current swept
        # parameters landed must not be reused — drop any boxes.pkl older
        # than the plan_inference.pkl so resume only skips fresh cases.
        for stale in out.glob("*_boxes.pkl"):
            if stale.stat().st_mtime < params_mtime:
                stale.unlink()
    predict_dir(
        [bundle],
        prep_dir / plan.plan_id / "imagesTr",
        out,
        case_ids=splits[fold]["val"],
        tta=tta,
        restore=restore,
        ensembler_parameters=params,
        batch_size=plan.batch_size,
        ensembler=ensembler,
        resume=resume,
    )
    return out


def materialize_val_predictions(
    task_dir,
    model_dir,
    fold: int,
    plan_id: str = "D3V001_3d",
    restore: bool = True,
) -> Path:
    """Produce one fold's final (restored) val-split box predictions from the
    sweep's saved ensembler states — zero device work.

    The sweep stage already ran the model once per case (with TTA) and saved
    the per-stream raw detections (``BoxEnsembler.save_state``); the final
    prediction is just that state re-postprocessed under the swept parameters
    (consolidated when present, the fold's own otherwise) and mapped back to
    the original image geometry. This is the cache-reuse the reference's
    sweeper exploits across parameter candidates
    (``/root/reference/nndet/evaluator/detection.py:900-1165``), extended to
    the cross-validation prediction export itself.
    """
    from nndetection_tpu.data.patching import pad_to_min_shape
    from nndetection_tpu.inference.restore import restore_detection

    task_dir, model_dir = Path(task_dir), Path(model_dir)
    prep_dir = task_dir / "preprocessed"
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    fold_dir = model_dir / f"fold{fold}"
    sweep_dir = fold_dir / "sweep"
    params = None
    for plan_inf in (
        model_dir / "consolidated" / "plan_inference.pkl",
        fold_dir / "plan_inference.pkl",
    ):
        if plan_inf.exists():
            params = load_pickle(plan_inf)["parameters"]
            break
    out = fold_dir / "val_predictions"
    out.mkdir(parents=True, exist_ok=True)
    image_dir = prep_dir / plan.plan_id / "imagesTr"
    ens_cls = BOX_ENSEMBLERS["BoxEnsemblerSelective"]
    for state_path in sorted(sweep_dir.glob("*_boxes_state.pkl")):
        cid = state_path.name[: -len("_boxes_state.pkl")]
        t0 = time.time()
        ens = ens_cls.from_checkpoint(state_path)
        if params:
            ens.update_parameters(**params)
        result = ens.get_case_result()
        boxes = result["pred_boxes"]
        # undo the predictor's pad-to-min-shape offset (state coordinates
        # live in the padded case grid)
        npy = image_dir / f"{cid}.npy"
        shape = (
            np.load(npy, mmap_mode="r").shape
            if npy.exists()
            else np.load(image_dir / f"{cid}.npz")["data"].shape
        )
        lower = np.asarray(
            [max(0, (m - s) // 2) for s, m in zip(shape[1:], plan.patch_size)],
            np.int64,
        )
        if lower.any() and len(boxes):
            from nndetection_tpu.core.boxes.ops_np import box_axis_vector_np

            boxes = boxes - box_axis_vector_np(
                lower.astype(np.float64), plan.dim
            )[None]
        props = (
            load_pickle(image_dir / f"{cid}.pkl")
            if (image_dir / f"{cid}.pkl").exists()
            else {}
        )
        if restore and props:
            boxes = restore_detection(
                boxes,
                transpose_forward=props.get("transpose_forward", [0, 1, 2]),
                original_spacing=props.get("original_spacing", np.ones(3)),
                resampled_spacing=props.get(
                    "spacing_after_resampling", np.ones(3)
                ),
                crop_bbox=props.get("crop_bbox"),
            )
        save_pickle(
            {
                "pred_boxes": boxes,
                "pred_scores": result["pred_scores"],
                "pred_labels": result["pred_labels"],
                "restored": bool(restore and props),
                "prediction_time_s": time.time() - t0,
            },
            out / f"{cid}_boxes.pkl",
        )
    return out


def run_predict_test(
    task_dir,
    model_dir,
    plan_id: str = "D3V001_3d",
    tta: bool = True,
    num_folds: int = NUM_FOLDS,
    restore: bool = True,
    ensembler: str = "BoxEnsemblerSelective",
) -> Path:
    """Preprocess + predict the test split with all consolidated folds
    (``scripts/predict.py:36-242``)."""
    task_dir, model_dir = Path(task_dir), Path(model_dir)
    prep_dir = task_dir / "preprocessed"
    plan: Plan = load_pickle(prep_dir / f"{plan_id}.pkl")
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")

    # preprocess test cases
    test_cases = discover_cases(
        task_dir / "raw_splitted" / "imagesTs",
        task_dir / "raw_splitted" / "labelsTs"
        if (task_dir / "raw_splitted" / "labelsTs").is_dir()
        else None,
        info.num_modalities,
    )
    cropped = task_dir / "raw_cropped_test"
    run_cropping(test_cases, cropped)
    test_images = prep_dir / plan.plan_id / "imagesTs"
    test_labels = prep_dir / plan.plan_id / "labelsTs"
    for c in test_cases:
        process_case(
            cropped,
            test_images,
            test_labels,
            c.case_id,
            target_spacing=np.asarray(plan.target_spacing),
            transpose_forward=plan.transpose_forward,
            normalization_schemes=plan.normalization_schemes,
            intensity_properties=plan.intensity_properties,
            use_nonzero_mask=plan.use_nonzero_mask,
        )
    unpack_dataset(test_images)

    bundles = load_all_models(model_dir, num_folds=num_folds)
    params = None
    plan_inf = model_dir / "consolidated" / "plan_inference.pkl"
    if plan_inf.exists():
        params = load_pickle(plan_inf)["parameters"]
    out = model_dir / "test_predictions"
    predict_dir(
        bundles,
        test_images,
        out,
        tta=tta,
        # reference predicts with restore=True: final boxes live in the
        # ORIGINAL image geometry (``/root/reference/scripts/predict.py:36-242``)
        restore=restore,
        ensembler_parameters=params,
        batch_size=plan.batch_size,
        ensembler=ensembler,
    )
    return out


def run_evaluate(
    task_dir, pred_dir, plan_id: str = "D3V001_3d", split: str = "Ts", save_dir=None
):
    task_dir, pred_dir = Path(task_dir), Path(pred_dir)
    info = DatasetInfo.from_file(task_dir / "dataset.yaml")
    classes = [str(info.labels[k]) for k in sorted(info.labels)]
    gt_dir = task_dir / "preprocessed" / plan_id / f"labels{split}"
    # predictions made with restore=True live in ORIGINAL image space and are
    # scored against the original-space GT export (`*_boxes_gt_orig.npz`)
    gt_suffix = "_boxes_gt.npz"
    sample = next(
        iter(
            p for p in sorted(pred_dir.glob("*_boxes.pkl"))
            if p.name != "results_boxes.pkl"
        ),
        None,
    )
    if sample is not None and load_pickle(sample).get("restored"):
        gt_suffix = "_boxes_gt_orig.npz"
    return evaluate_box_dir(
        pred_dir, gt_dir, classes, save_dir=save_dir or pred_dir, fast=False,
        gt_suffix=gt_suffix,
    )
