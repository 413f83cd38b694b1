"""Toy-dataset acceptance run on real hardware (reference README.md:163-175:
"the final results should be near perfect").

Generates a synthetic task matching the reference's ``nndet_example``
semantics (``/root/reference/scripts/generate_example.py:43-98``: noise
volumes, one bright solid or hollow cube per case, 2 classes), runs
prep -> train (fold 0) -> consolidate -> predict -> evaluate through the
actual pipeline and prints + saves the final AP metrics.

Scale is env-tunable:
    TOY_NUM_TRAIN / TOY_NUM_TEST   dataset size          (default 16 / 8)
    TOY_IMAGE_SIZE                 cubic image edge      (default 128)
    TOY_EPOCHS / TOY_STEPS         training length       (default 20 / 150)
    TOY_OUT                        result json artifact  (default
                                   artifacts/toy_accept.json in the repo)
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nndetection_tpu.data.example import generate_example_dataset
from nndetection_tpu.pipeline import (
    run_consolidate,
    run_evaluate,
    run_predict_test,
    run_prep,
    run_sweep,
    run_train,
)
from nndetection_tpu.planning.planner import Planner

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    root = Path(os.environ.get("TOY_ROOT", "/tmp/toy_accept"))
    num_train = int(os.environ.get("TOY_NUM_TRAIN", 16))
    num_test = int(os.environ.get("TOY_NUM_TEST", 8))
    edge = int(os.environ.get("TOY_IMAGE_SIZE", 128))
    epochs = int(os.environ.get("TOY_EPOCHS", 20))
    steps = int(os.environ.get("TOY_STEPS", 150))
    out_json = Path(os.environ.get("TOY_OUT", REPO / "artifacts" / "toy_accept.json"))

    resume = os.environ.get("TOY_RESUME", "") == "1"
    # reuse an already-generated+prepped dataset but train from scratch
    # (e.g. the exact-topk ablation leg against the same data)
    reuse_data = os.environ.get("TOY_REUSE_DATA", "") == "1" or resume
    task = root / "Task000D3_Example"
    if not reuse_data:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        task = generate_example_dataset(
            task,
            num_train=num_train,
            num_test=num_test,
            image_size=(edge, edge, edge),
            # reference scale: object 16-32 voxels, hollow wall 4 (generate_example.py:43-46)
            object_size=(16, 32),
            object_width=4,
        )
        log(f"dataset generated: {num_train}+{num_test} cases @ {edge}^3")
        plan = run_prep(task, planner=Planner(anchor_budget=600))
        log(
            f"prep done: patch={plan.patch_size} batch={plan.batch_size} "
            f"anchors_score={plan.anchor_score:.3f}"
        )
    else:
        from nndetection_tpu.utils.io import load_pickle

        plan = load_pickle(task / "preprocessed" / "D3V001_3d.pkl")
        log(f"resuming: patch={plan.patch_size} batch={plan.batch_size}")

    tag = os.environ.get("TOY_TAG", "")
    model_dir = root / "models" / task.name / f"RetinaUNetV001_D3V001_3d{tag}"

    def log_fn(epoch, metrics):
        keys = (
            "train_total", "val_total", "mAP_IoU_0.10_0.50_0.05_MaxDet_100",
            "train_nonfinite_steps", "host_rss_gb",
        )
        log(f"epoch {epoch}: " + " ".join(
            f"{k}={metrics[k]:.4f}" for k in keys if k in metrics))

    swa_epochs = max(1, epochs // 10)
    total_epochs = epochs + swa_epochs
    # chunk the run across process restarts: the axon tunnel client leaks
    # every host->device transfer buffer (~124 MB/step at this scale), so one
    # process cannot survive the whole run. TOY_CHUNK epochs per process; the
    # wrapper loop re-execs with TOY_RESUME=1 until training completes.
    chunk = int(os.environ.get("TOY_CHUNK", 0))
    stop_after = None
    if chunk > 0:
        start = -1
        ckpt = model_dir / "fold0" / "model_last.ckpt"
        if resume and ckpt.exists():
            from nndetection_tpu.utils.io import load_pickle as _lp

            start = int(_lp(ckpt)["extra"].get("epoch", -1))
        stop_after = start + chunk

    # ablation switch (VERDICT r1 #8): train with EXACT top-k in ATSS/HNM
    # instead of approx_{min,max}_k and compare final AP
    exact_topk = os.environ.get("TOY_EXACT_TOPK", "") == "1"

    run_train(
        task,
        model_dir,
        fold=0,
        trainer_overrides=dict(
            max_epochs=epochs,
            num_train_batches_per_epoch=steps,
            num_val_batches_per_epoch=6,
            warm_iterations=min(200, epochs * steps // 10),
            swa_epochs=swa_epochs,
        ),
        model_overrides=dict(exact_topk=True) if exact_topk else None,
        log_fn=log_fn,
        resume=resume,
        stop_after_epoch=stop_after,
    )
    if stop_after is not None and stop_after < total_epochs - 1:
        log(f"chunk done (through epoch {stop_after}); exiting for restart")
        sys.exit(3)
    log("training done")
    # postprocessing-parameter sweep on the val split (the reference's
    # train --sweep stage); consolidation then writes plan_inference.pkl
    if os.environ.get("TOY_SWEEP", "") == "1":
        run_sweep(task, model_dir, fold=0)
        log("swept postprocessing parameters")
    run_consolidate(task, model_dir, num_folds=1)
    log("consolidated")
    pred_dir = run_predict_test(task, model_dir, num_folds=1)
    log("predicted test split")
    scores, _ = run_evaluate(task, pred_dir)
    ap_keys = {k: v for k, v in scores.items() if "AP" in k or "FROC" in k}
    log("RESULTS " + json.dumps(ap_keys))
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps({
        "config": {
            "num_train": num_train, "num_test": num_test, "image_size": edge,
            "epochs": epochs, "steps_per_epoch": steps,
            "patch_size": list(plan.patch_size), "batch_size": plan.batch_size,
        },
        "wall_clock_s": round(time.time() - T0, 1),
        "metrics": {k: float(v) for k, v in scores.items()
                    if isinstance(v, (int, float))},
    }, indent=2))
    log(f"wrote {out_json}")


if __name__ == "__main__":
    main()
