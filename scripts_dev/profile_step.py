"""Capture a device profile of the train step and summarize op costs."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def main():
    import jax

    from bench import luna_cfg, make_batch
    from nndetection_tpu.data.augment import AugmentConfig, get_generator_patch_size
    from nndetection_tpu.parallel.mesh import make_mesh, shard_batch
    from nndetection_tpu.train.trainer import Trainer, TrainerConfig

    patch = (96, 128, 128)
    batch = int(os.environ.get("PROF_BATCH", 4))
    remat = os.environ.get("PROF_REMAT", "1") == "1"
    cfg = luna_cfg(patch, remat=remat)
    log(f"profiling batch={batch} remat={remat}")
    tr = Trainer(
        cfg,
        TrainerConfig(batch_size=batch, warm_iterations=10),
        mesh=make_mesh(n_data=1),
        augment_cfg=AugmentConfig(patch_size=cfg.patch_size),
    )
    state = tr.init_state()
    gp = get_generator_patch_size(patch)
    db = shard_batch(tr.mesh, make_batch(np.random.RandomState(0), batch, gp))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, losses = tr._train_step(state, db, key)
    jax.block_until_ready(state.params)
    log(f"compile+1st step: {time.time()-t0:.1f}s")
    for i in range(3):
        key, sub = jax.random.split(key)
        state, _ = tr._train_step(state, db, sub)
    jax.block_until_ready(state.params)

    trace_dir = "/tmp/jaxtrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            key, sub = jax.random.split(key)
            state, _ = tr._train_step(state, db, sub)
        jax.block_until_ready(state.params)
    log("trace captured")

    # summarize device op durations from the chrome trace
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {files}")
    totals = defaultdict(float)
    exact = defaultdict(float)
    device_total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e6  # seconds
            args = ev.get("args") or {}
            # device lanes usually carry 'long_name'/'tf_op' args
            key_name = args.get("long_name") or name
            short = key_name.split(".")[0][:60]
            totals[short] += dur
            device_total += dur
            # exact-op aggregation: fusion.N names resolve into the HLO body
            exact[key_name.split(" ")[0]] += dur
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    log(f"total traced op-seconds: {device_total:.2f} (3 steps)")
    for name, dur in top:
        log(f"{dur:8.3f}s  {name}")

    # per-op drill-down: the top exact ops, each located in the optimized HLO
    # so the fusion body (what it reads/writes) is visible
    log("\n== top exact ops ==")
    try:
        hlo = tr._train_step.lower(state, db, key).compile().as_text()
    except Exception as e:
        hlo = ""
        log(f"(no HLO text: {e})")
    hlo_lines = hlo.splitlines()
    top_exact = sorted(exact.items(), key=lambda kv: -kv[1])[:15]
    for name, dur in top_exact:
        log(f"{dur:8.3f}s  {name}")
        opname = name.lstrip("%")
        body = [
            (i, l) for i, l in enumerate(hlo_lines)
            if f"%{opname} " in l or l.strip().startswith(f"{opname} =")
        ]
        for i, l in body[:1]:
            snippet = l.strip()
            log(f"           {snippet[:240]}")
            # for fusions, also show the called computation's largest lines
            if "fusion(" in snippet and "calls=" in snippet:
                callee = snippet.split("calls=")[1].split(",")[0].split(")")[0]
                callee = callee.strip("%")
                in_body = False
                shown = 0
                for l2 in hlo_lines:
                    if l2.strip().startswith(f"%{callee} ") or l2.strip().startswith(f"{callee} "):
                        in_body = True
                        continue
                    if in_body:
                        if l2.strip().startswith("}"):
                            break
                        t = l2.strip()
                        if any(k in t for k in ("convolution", "reduce", "dot", "convert", "multiply")) and shown < 4:
                            log(f"             | {t[:200]}")
                            shown += 1


if __name__ == "__main__":
    main()
