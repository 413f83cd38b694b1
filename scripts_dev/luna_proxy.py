"""LUNA-proxy benchmark: realistic-statistics accuracy at scale, end to end.

Real LUNA16 is environment-blocked (no data, no egress), so this drives the
closest on-disk stand-in (``nndetection_tpu/data/luna_proxy.py``: LUNA16
subset layout, anisotropic CT-like thoracic volumes, 0-3 nodules/case with
the 3-30 mm diameter distribution) through the FULL pipeline the reference
uses for its published LUNA result (CV FROC/CPM,
``/root/reference/docs/results/nnDetectionV001.md:107``):

    generate -> Task016 convert -> prep (plan + preprocess) ->
    train N folds -> per-fold postprocessing sweep -> consolidate ->
    restored CV val predictions -> world-coordinate CPM csv export ->
    official-semantics FROC/CPM score + box-AP eval.

Runbook for real LUNA16, the day data exists: replace stage 1-2 with
``python projects/Task016_Luna/prepare.py --source /path/LUNA16`` and run the
same driver with PROXY_SKIP_GENERATE=1 pointing PROXY_ROOT at det_data.

Every stage is resume-safe (marker files / checkpoint resume); per-epoch
host RSS is recorded to bound the axon transfer-leak budget.

Scale knobs (env):
    PROXY_NUM_CASES=125  PROXY_INPLANE=256   dataset size
    PROXY_EPOCHS=15  PROXY_STEPS=250  PROXY_SWA=2  PROXY_VAL_STEPS=20
    PROXY_FOLDS=0,1,2,3,4  PROXY_MODEL_NAME=RetinaUNetV001
    PROXY_ROOT=/tmp/luna_proxy  PROXY_OUT=artifacts/luna_proxy.json
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import importlib.util  # noqa: E402

import numpy as np  # noqa: E402

if os.environ.get("PROXY_PLATFORM"):
    # this axon jax build ignores JAX_PLATFORMS; use the config knob
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["PROXY_PLATFORM"])

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024 / 1024
    return -1.0


def load_task016():
    spec = importlib.util.spec_from_file_location(
        "task016_prepare", REPO / "projects" / "Task016_Luna" / "prepare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    root = Path(os.environ.get("PROXY_ROOT", "/tmp/luna_proxy"))
    num_cases = int(os.environ.get("PROXY_NUM_CASES", 125))
    inplane = int(os.environ.get("PROXY_INPLANE", 256))
    epochs = int(os.environ.get("PROXY_EPOCHS", 15))
    steps = int(os.environ.get("PROXY_STEPS", 250))
    swa_epochs = int(os.environ.get("PROXY_SWA", 2))
    val_steps = int(os.environ.get("PROXY_VAL_STEPS", 20))
    folds = [int(f) for f in os.environ.get("PROXY_FOLDS", "0,1,2,3,4").split(",")]
    model_name = os.environ.get("PROXY_MODEL_NAME", "RetinaUNetV001")
    out_json = Path(os.environ.get("PROXY_OUT", REPO / "artifacts" / "luna_proxy.json"))
    batch_size = os.environ.get("PROXY_BATCH")
    warm = int(os.environ.get(
        "PROXY_WARMUP", max(200, epochs * steps // 20)
    ))

    raw = root / "raw"
    task = root / "Task916_LunaProxy"
    model_dir = root / "models" / task.name / model_name
    task016 = load_task016()
    telemetry = {"rss_gb": [], "stage_times": {}}

    # ---- stage 1: generate ------------------------------------------------
    if os.environ.get("PROXY_SKIP_GENERATE") != "1":
        if not (raw / "annotations.csv").exists():
            from nndetection_tpu.data.luna_proxy import generate_luna_proxy

            log(f"generating {num_cases} proxy cases (inplane={inplane})")
            t = time.time()
            generate_luna_proxy(raw, num_cases=num_cases, inplane=inplane)
            telemetry["stage_times"]["generate"] = time.time() - t
            log(f"generated -> {raw}")
        else:
            log("stage generate: already done")

    # ---- stage 2: convert (the real Task016 converter) --------------------
    if not (task / "dataset.yaml").exists():
        log("converting via projects/Task016_Luna/prepare.py::convert")
        t = time.time()
        task016.convert(raw, task)
        telemetry["stage_times"]["convert"] = time.time() - t
    else:
        log("stage convert: already done")

    # ---- stage 3: prep ----------------------------------------------------
    from nndetection_tpu.pipeline import (
        make_splits,
        materialize_val_predictions,
        run_consolidate,
        run_prep,
        run_sweep,
        run_train,
    )
    from nndetection_tpu.utils.io import load_pickle, save_json

    plan_pkl = task / "preprocessed" / "D3V001_3d.pkl"
    if not plan_pkl.exists():
        log("prep: crop -> analyze -> plan -> preprocess")
        t = time.time()
        plan = run_prep(task)
        telemetry["stage_times"]["prep"] = time.time() - t
    else:
        plan = load_pickle(plan_pkl)
    log(
        f"plan: patch={plan.patch_size} batch={plan.batch_size} "
        f"spacing={np.round(plan.target_spacing, 3).tolist()} "
        f"dummy2d={plan.do_dummy_2d}"
    )

    # folds beyond the first (showcase) fold can run a lighter recipe —
    # PROXY_EPOCHS_REST / PROXY_SWA_REST / PROXY_STEPS_REST (default: same)
    epochs_rest = int(os.environ.get("PROXY_EPOCHS_REST", epochs))
    swa_rest = int(os.environ.get("PROXY_SWA_REST", swa_epochs))
    steps_rest = int(os.environ.get("PROXY_STEPS_REST", steps))

    def overrides_for(fold):
        e = epochs if fold == folds[0] else epochs_rest
        sw = swa_epochs if fold == folds[0] else swa_rest
        st = steps if fold == folds[0] else steps_rest
        # adaptive wall-clock control: a small override file re-read at every
        # fold boundary lets the operator retune the remaining folds' depth
        # WITHOUT restarting the process (a restart repays the 10-14 min
        # remote train-step compile on the axon tunnel). Keys: epochs_rest,
        # swa_rest, steps_rest; applies only to folds after the first.
        ov_file = root / "overrides.json"
        if fold != folds[0] and ov_file.exists():
            try:
                live = json.loads(ov_file.read_text())
                e = int(live.get("epochs_rest", e))
                sw = int(live.get("swa_rest", sw))
                st = int(live.get("steps_rest", st))
                log(f"fold {fold}: live overrides {live}")
            except Exception as exc:  # malformed file must not kill the run
                log(f"fold {fold}: ignoring overrides.json ({exc})")
        ov = dict(
            max_epochs=e,
            num_train_batches_per_epoch=st,
            num_val_batches_per_epoch=val_steps,
            swa_epochs=sw,
            warm_iterations=int(os.environ.get(
                "PROXY_WARMUP", max(200, e * st // 20)
            )),
        )
        if batch_size:
            ov["batch_size"] = int(batch_size)
        return ov

    # HBM escape hatch: force activation remat regardless of the plan's
    # no-remat probe decision (PROXY_REMAT=1)
    model_overrides = (
        {"remat": True} if os.environ.get("PROXY_REMAT") == "1" else None
    )

    # ---- stage 4: train + sweep per fold ----------------------------------
    fold_summaries = {}
    fold_histories = {}
    for fold in folds:
        fold_dir = model_dir / f"fold{fold}"
        marker = fold_dir / ".train_done"
        hist_path = fold_dir / "train_history.jsonl"
        trainer_overrides = overrides_for(fold)
        if marker.exists():
            log(f"fold {fold}: training already done")
        else:
            # a fresh (non-resumable) run must not append to a stale epoch
            # sequence — fold_histories would mix two runs' rows
            if hist_path.exists() and not (fold_dir / "model_last.ckpt").exists():
                log(f"fold {fold}: no resumable checkpoint, truncating stale history")
                hist_path.unlink()
            log(
                f"fold {fold}: training "
                f"{trainer_overrides['max_epochs']}+"
                f"{trainer_overrides['swa_epochs']} epochs x "
                f"{trainer_overrides['num_train_batches_per_epoch']} steps"
            )
            t = time.time()
            hist_f = None

            def log_epoch(epoch, metrics):
                nonlocal hist_f
                if hist_f is None:
                    fold_dir.mkdir(parents=True, exist_ok=True)
                    hist_f = open(hist_path, "a")
                row = {
                    "epoch": epoch,
                    "rss_gb": round(rss_gb(), 3),
                    **{
                        k: round(float(v), 5)
                        for k, v in metrics.items()
                        if np.isscalar(v) or getattr(v, "ndim", 1) == 0
                    },
                }
                telemetry["rss_gb"].append(row["rss_gb"])
                hist_f.write(json.dumps(row) + "\n")
                hist_f.flush()
                log(
                    f"fold {fold} epoch {epoch}: "
                    f"mAP={metrics.get('mAP_IoU_0.10_0.50_0.05_MaxDet_100', float('nan')):.4f} "
                    f"loss={metrics.get('train_total', float('nan')):.4f} "
                    f"nonfinite={metrics.get('train_nonfinite_steps', 0):.0f} "
                    f"rss={row['rss_gb']:.2f}GB"
                )

            run_train(
                task,
                model_dir,
                fold=fold,
                trainer_overrides=trainer_overrides,
                model_overrides=model_overrides,
                log_fn=log_epoch,
                resume=True,
            )
            if hist_f:
                hist_f.close()
            marker.write_text(json.dumps(trainer_overrides))
            telemetry["stage_times"][f"train_fold{fold}"] = time.time() - t
        if not (fold_dir / "plan_inference.pkl").exists():
            log(f"fold {fold}: postprocessing sweep")
            t = time.time()
            sweep_res = run_sweep(task, model_dir, fold)
            telemetry["stage_times"][f"sweep_fold{fold}"] = time.time() - t
            log(f"fold {fold}: sweep best score {sweep_res.get('score', 'n/a')}")
        if hist_path.exists():
            rows = [json.loads(l) for l in hist_path.read_text().splitlines()]
            if rows:
                fold_summaries[fold] = rows[-1]
                fold_histories[fold] = rows
        # partial artifact after every fold: a chip-budget overrun must not
        # lose the completed folds' evidence
        partial = out_json.with_name(out_json.stem + "_partial.json")
        save_json(
            {
                "completed_folds": sorted(fold_summaries),
                "fold_final_epochs": fold_summaries,
                "fold_histories": fold_histories,
                "stage_times_s": {
                    k: round(v, 1) for k, v in telemetry["stage_times"].items()
                },
            },
            partial,
        )

    # ---- stage 5: consolidate --------------------------------------------
    if not (model_dir / "consolidated" / "plan_inference.pkl").exists():
        log("consolidate: unified cross-fold sweep")
        t = time.time()
        run_consolidate(task, model_dir, num_folds=len(folds))
        telemetry["stage_times"]["consolidate"] = time.time() - t

    # ---- stage 6: restored CV val predictions -----------------------------
    for fold in folds:
        out = model_dir / f"fold{fold}" / "val_predictions"
        existing = list(out.glob("*_boxes.pkl"))
        # staleness: predictions materialized before the current swept
        # parameters (fold or consolidated plan) must be refreshed
        plan_mtimes = [
            p.stat().st_mtime
            for p in (
                model_dir / "consolidated" / "plan_inference.pkl",
                model_dir / f"fold{fold}" / "plan_inference.pkl",
            )
            if p.exists()
        ]
        fresh = existing and (
            not plan_mtimes
            or min(q.stat().st_mtime for q in existing) >= max(plan_mtimes)
        )
        if fresh:
            log(f"fold {fold}: val predictions already exist")
            continue
        # the sweep already ran the model once per val case (TTA) and saved
        # the raw per-stream detections; the final restored predictions are
        # materialized from those states under the consolidated parameters —
        # zero device work (pipeline.materialize_val_predictions)
        log(f"fold {fold}: restored val predictions from sweep states")
        t = time.time()
        materialize_val_predictions(task, model_dir, fold)
        telemetry["stage_times"][f"predict_fold{fold}"] = time.time() - t

    # ---- stage 7: CPM + box AP on the pooled CV predictions ---------------
    import shutil

    pooled = model_dir / "cv_predictions"
    pooled.mkdir(exist_ok=True)
    for fold in folds:
        for p in (model_dir / f"fold{fold}" / "val_predictions").glob("*_boxes.pkl"):
            dst = pooled / p.name
            if not dst.exists() or p.stat().st_mtime > dst.stat().st_mtime:
                shutil.copy(p, dst)

    cpm_csv = model_dir / "cpm_predictions.csv"
    task016.export_cpm(pooled, task / "raw_splitted" / "labelsTr", cpm_csv)
    # the scored series set is the union of the scored folds' val splits —
    # NOT whatever prediction pickles happen to exist: a missing case must
    # count its annotations as misses, not silently shrink the denominator
    splits = load_pickle(task / "preprocessed" / "splits_final.pkl")
    series = sorted({cid for f in folds for cid in splits[f]["val"]})
    predicted = {
        p.name[: -len("_boxes.pkl")]
        for p in pooled.glob("*_boxes.pkl")
        if p.name != "results_boxes.pkl"
    }
    missing = sorted(set(series) - predicted)
    if missing:
        log(
            f"WARNING: {len(missing)} val cases have no prediction pickle "
            f"(scored as all-miss): {missing[:5]}{'...' if len(missing) > 5 else ''}"
        )
    cpm = task016.score_cpm(cpm_csv, raw / "annotations.csv", series=series)
    log(f"CPM={cpm['cpm']:.4f} FROC={cpm['froc']}")

    from nndetection_tpu.pipeline import run_evaluate

    box_metrics, _curves = run_evaluate(task, pooled, split="Tr")
    ap_keys = {
        k: round(float(v), 4)
        for k, v in box_metrics.items()
        if isinstance(v, (int, float)) and ("AP" in k or "FROC" in k)
    }
    log(f"box eval mAP={box_metrics.get('mAP_IoU_0.10_0.50_0.05_MaxDet_100')}")

    result = {
        "config": {
            "num_cases": num_cases, "inplane": inplane, "epochs": epochs,
            "steps": steps, "swa_epochs": swa_epochs, "warmup": warm,
            "folds": folds, "batch_size": plan.batch_size,
            "patch_size": list(plan.patch_size),
            "target_spacing": [float(s) for s in plan.target_spacing],
        },
        "cpm": cpm,
        "box_eval": ap_keys,
        "fold_final_epochs": fold_summaries,
        "fold_histories": fold_histories,
        "telemetry": {
            "stage_times_s": {k: round(v, 1) for k, v in telemetry["stage_times"].items()},
            "rss_gb_max": max(telemetry["rss_gb"]) if telemetry["rss_gb"] else None,
        },
        "reference_bar": {
            "luna16_cpm_10fold": 0.930,
            "note": "real LUNA16 blocked in env; this is the synthetic proxy",
        },
        "in_stats_provenance": (
            "IN statistics schedule varied across training segments as the "
            "plane_sub:8 default landed mid-campaign: folds 0-2 initial "
            "epochs two_pass, folds 3-4 and all resumed/extended epochs "
            "plane_sub:8. Both are validated estimators of the same "
            "statistic (toy-accept A/B artifacts/toy_accept_plane8.json, "
            "inference A/B artifacts/in_stats_ab_fold3.json)."
        ),
    }
    out_json.parent.mkdir(parents=True, exist_ok=True)
    save_json(result, out_json)
    log(f"wrote {out_json}")


if __name__ == "__main__":
    main()
