"""Endurance leg: the reference's FULL step schedule at real scale.

The reference trains 50 epochs x 2500 steps + 10 SWA epochs
(``/root/reference/nndet/conf/train/v001.yaml:44-58``) = 150k optimizer
steps. This driver runs exactly that step count — warmup(4000) -> poly decay
-> cyclic SWA transitions included — on the toy task at a small patch so the
leg fits a chip-hours budget, with the telemetry VERDICT r3 #3 asks for:
per-epoch ``train_nonfinite_steps``, host RSS, epoch wall time, and the LR
actually scheduled at each epoch boundary (warmup -> poly -> cyclic visible
in the artifact).

Resume-safe at epoch granularity (same mechanism as the proxy driver); run
under ``scripts_dev/run_guarded.sh`` for the axon RSS leak.

Env knobs:
    END_IMAGE  cubic toy image edge (default 48)
    END_EPOCHS / END_STEPS / END_SWA (default 50 / 2500 / 10)
    END_VAL_STEPS (default 100, the v001 validation length)
    END_BATCH  (default 4, the v001 batch)
    END_OUT    artifact path (default artifacts/endurance.json)
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

import numpy as np  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024 / 1024
    return -1.0


def main():
    from nndetection_tpu.data.example import generate_example_dataset
    from nndetection_tpu.pipeline import run_prep, run_train
    from nndetection_tpu.planning.planner import Planner
    from nndetection_tpu.train.lr import swa_schedule

    image = int(os.environ.get("END_IMAGE", 48))
    epochs = int(os.environ.get("END_EPOCHS", 50))
    steps = int(os.environ.get("END_STEPS", 2500))
    swa = int(os.environ.get("END_SWA", 10))
    val_steps = int(os.environ.get("END_VAL_STEPS", 100))
    batch = int(os.environ.get("END_BATCH", 4))
    out_json = Path(os.environ.get("END_OUT", REPO / "artifacts" / "endurance.json"))
    root = Path(os.environ.get("END_ROOT", "/tmp/endurance"))

    task = root / "Task000D3_Endurance"
    if not (task / "dataset.yaml").exists():
        log(f"generating toy task (image {image}^3)")
        generate_example_dataset(
            task, num_train=12, num_test=2,
            image_size=(image,) * 3, object_size=(8, 16), object_width=2,
        )
    plan_pkl = task / "preprocessed" / "D3V001_3d.pkl"
    if not plan_pkl.exists():
        log("prep")
        run_prep(task, planner=Planner(anchor_budget=200))

    model_dir = root / "models" / "Endurance"
    fold_dir = model_dir / "fold0"
    hist_path = fold_dir / "train_history.jsonl"

    # the exact schedule the trainer builds — logged at epoch boundaries so
    # the warmup -> poly -> cyclic transitions are in the artifact
    lr_fn = swa_schedule(
        0.01, 4000, 1e-6, 0.9, epochs * steps, steps
    )

    hist_f = None

    def log_epoch(epoch, metrics):
        nonlocal hist_f
        if hist_f is None:
            fold_dir.mkdir(parents=True, exist_ok=True)
            hist_f = open(hist_path, "a")
        row = {
            "epoch": epoch,
            "lr_at_epoch_start": float(lr_fn(epoch * steps)),
            "rss_gb": round(rss_gb(), 3),
            **{
                k: round(float(v), 5)
                for k, v in metrics.items()
                if np.isscalar(v) or getattr(v, "ndim", 1) == 0
            },
        }
        hist_f.write(json.dumps(row) + "\n")
        hist_f.flush()
        # partial artifact every epoch: a chip-budget overrun must not lose
        # the completed epochs' evidence
        partial = out_json.with_name(out_json.stem + "_partial.json")
        partial.parent.mkdir(parents=True, exist_ok=True)
        with open(partial, "w") as pf:
            json.dump(
                {
                    "epochs_completed_through": epoch,
                    "total_planned_epochs": epochs + swa,
                    "steps_per_epoch": steps,
                    "last_row": row,
                },
                pf, indent=1,
            )
        log(
            f"epoch {epoch}: lr={row['lr_at_epoch_start']:.2e} "
            f"loss={metrics.get('train_total', float('nan')):.4f} "
            f"nonfinite={metrics.get('train_nonfinite_steps', 0):.0f} "
            f"rss={row['rss_gb']:.2f}GB "
            f"t={metrics.get('epoch_time_s', 0):.0f}s"
        )

    t = time.time()
    run_train(
        task, model_dir, fold=0,
        trainer_overrides=dict(
            max_epochs=epochs,
            num_train_batches_per_epoch=steps,
            num_val_batches_per_epoch=val_steps,
            swa_epochs=swa,
            batch_size=batch,
            warm_iterations=4000,
        ),
        log_fn=log_epoch,
        resume=True,
    )
    if hist_f:
        hist_f.close()
    wall = time.time() - t

    rows = [json.loads(l) for l in hist_path.read_text().splitlines()]
    # dedupe resume-restarted epochs: keep the last row per epoch
    by_epoch = {}
    for r in rows:
        by_epoch[r["epoch"]] = r
    rows = [by_epoch[e] for e in sorted(by_epoch)]
    lrs = {r["epoch"]: r["lr_at_epoch_start"] for r in rows}
    result = {
        "config": {
            "epochs": epochs, "steps_per_epoch": steps, "swa_epochs": swa,
            "batch_size": batch, "image": image,
            "total_optimizer_steps": (epochs + swa) * steps,
        },
        "wall_clock_s": round(wall, 1),
        "epochs_completed": len(rows),
        "train_nonfinite_steps_total": int(
            sum(r.get("train_nonfinite_steps", 0) for r in rows)
        ),
        "rss_gb_first": rows[0]["rss_gb"] if rows else None,
        "rss_gb_max": max(r["rss_gb"] for r in rows) if rows else None,
        "lr_transitions": {
            "epoch0_warmup": lrs.get(0),
            "epoch2_post_warmup": lrs.get(2),
            "mid_poly": lrs.get(epochs // 2),
            "last_main_epoch": lrs.get(epochs - 1),
            "first_swa_epoch": lrs.get(epochs),
            "last_swa_epoch": lrs.get(epochs + swa - 1),
        },
        "final_epoch": rows[-1] if rows else None,
        "schedule_reference": "nndet/conf/train/v001.yaml:44-58 (50x2500 + 10 SWA)",
    }
    out_json.parent.mkdir(parents=True, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {out_json}: nonfinite={result['train_nonfinite_steps_total']} "
        f"rss {result['rss_gb_first']}->{result['rss_gb_max']}GB")


if __name__ == "__main__":
    main()
