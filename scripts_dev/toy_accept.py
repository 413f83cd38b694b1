"""Toy-dataset acceptance run on real hardware (reference README.md:163-175:
"the final results should be near perfect").

Generates a mid-size synthetic task, runs prep -> train (fold 0) ->
consolidate -> predict -> evaluate through the actual pipeline and prints the
final AP metrics.
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nndetection_tpu.data.example import generate_example_dataset
from nndetection_tpu.pipeline import (
    run_consolidate,
    run_evaluate,
    run_predict_test,
    run_prep,
    run_train,
)
from nndetection_tpu.planning.planner import Planner

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    root = Path("/tmp/toy_accept")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    task = generate_example_dataset(
        root / "Task000D3_Example",
        num_train=12,
        num_test=4,
        image_size=(64, 64, 64),
        object_size=(10, 20),
        object_width=3,
    )
    log("dataset generated")
    plan = run_prep(task, planner=Planner(anchor_budget=600))
    log(
        f"prep done: patch={plan.patch_size} batch={plan.batch_size} "
        f"anchors_score={plan.anchor_score:.3f}"
    )

    model_dir = root / "models" / task.name / "RetinaUNetV001_D3V001_3d"
    epochs = int(os.environ.get("TOY_EPOCHS", 4))
    steps = int(os.environ.get("TOY_STEPS", 75))

    def log_fn(epoch, metrics):
        keys = ("train_total", "mAP_IoU_0.10_0.50_0.05_MaxDet_100")
        log(f"epoch {epoch}: " + " ".join(
            f"{k}={metrics[k]:.4f}" for k in keys if k in metrics))

    run_train(
        task,
        model_dir,
        fold=0,
        trainer_overrides=dict(
            max_epochs=epochs,
            num_train_batches_per_epoch=steps,
            num_val_batches_per_epoch=6,
            warm_iterations=40,
            swa_epochs=1,
        ),
        log_fn=log_fn,
    )
    log("training done")
    run_consolidate(task, model_dir, num_folds=1)
    log("consolidated")
    pred_dir = run_predict_test(task, model_dir, num_folds=1)
    log("predicted test split")
    scores, _ = run_evaluate(task, pred_dir)
    ap_keys = {k: v for k, v in scores.items() if "AP" in k or "FROC" in k}
    log("RESULTS " + json.dumps(ap_keys))


if __name__ == "__main__":
    main()
