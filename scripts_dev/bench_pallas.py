"""Measured lax-vs-Pallas comparison on the box-geometry hot paths
(VERDICT r2 #4: put a Pallas kernel on a measured hot path or retire the
tier, with the measurement committed either way).

Benchmarks on the real chip:
  1. truncated greedy NMS (the per-tile inference postprocess core):
     ``core/boxes/nms.py::topk_nms`` (lax argmax-suppress scan) vs
     ``ops/pallas_ops.py::nms_topk_pallas`` (single-invocation VMEM kernel)
  2. pairwise IoU matrix at WBC scale:
     ``core/boxes/ops.py::box_iou`` vs ``ops/pallas_ops.py::iou_matrix_pallas``

Prints one JSON line per (op, size) with both times and the speedup.
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    prev = None
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def boxes_scores(rng, n):
    ctr = rng.uniform(20, 300, (n, 3)).astype(np.float32)
    sz = rng.uniform(2, 30, (n, 3)).astype(np.float32)
    boxes = np.stack([
        ctr[:, 0] - sz[:, 0], ctr[:, 1] - sz[:, 1],
        ctr[:, 0] + sz[:, 0], ctr[:, 1] + sz[:, 1],
        ctr[:, 2] - sz[:, 2], ctr[:, 2] + sz[:, 2],
    ], axis=1)
    return jnp.asarray(boxes), jnp.asarray(rng.rand(n).astype(np.float32))


def main():
    from nndetection_tpu.core.boxes.nms import topk_nms
    from nndetection_tpu.core.boxes.ops import box_iou
    from nndetection_tpu.ops.pallas_ops import iou_matrix_pallas, nms_topk_pallas

    rng = np.random.RandomState(0)
    results = []

    for n, max_out in ((1000, 100), (4096, 100), (10000, 100)):
        boxes, scores = boxes_scores(rng, n)
        valid = jnp.ones((n,), bool)

        lax_fn = jax.jit(
            lambda b, s, v: topk_nms(b, s, v, 0.5, max_out)
        )
        pal_fn = jax.jit(
            lambda b, s, v: nms_topk_pallas(b, s, v, 0.5, max_out)
        )
        # semantic check on-device first
        li, lv = lax_fn(boxes, scores, valid)
        pi, pv = pal_fn(boxes, scores, valid)
        m = np.asarray(lv)
        same = bool(
            np.array_equal(np.asarray(li)[m], np.asarray(pi)[m])
            and np.array_equal(m, np.asarray(pv))
        )
        t_lax = timeit(lax_fn, boxes, scores, valid)
        t_pal = timeit(pal_fn, boxes, scores, valid)
        row = {
            "op": "nms_topk", "n": n, "max_out": max_out,
            "lax_ms": round(t_lax * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_lax / t_pal, 2), "identical": same,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    for n in (2048, 8192):
        boxes, _ = boxes_scores(rng, n)
        lax_fn = jax.jit(lambda b: box_iou(b, b))
        pal_fn = jax.jit(lambda b: iou_matrix_pallas(b, b))
        a = np.asarray(lax_fn(boxes))
        b = np.asarray(pal_fn(boxes))
        err = float(np.max(np.abs(a - b)))
        t_lax = timeit(lax_fn, boxes)
        t_pal = timeit(pal_fn, boxes)
        row = {
            "op": "iou_matrix", "n": n,
            "lax_ms": round(t_lax * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_lax / t_pal, 2), "max_err": err,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = Path(__file__).resolve().parent.parent / "artifacts" / "pallas_bench.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({"device": str(jax.devices()[0]), "results": results}, indent=1))
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
