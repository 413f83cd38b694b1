"""Hunt the rare (~1 in 150 steps) non-finite training step seen on real
TPU toy runs (all four losses NaN simultaneously while the no-augmentation
val losses stay finite -> suspicion: the augmentation chain occasionally
emits non-finite voxels, or a specific augmented patch blows up bf16
activations).

Runs the REAL pipeline pieces against the prepared toy dataset:
  phase 1: augment_batch over many rng keys -> isfinite(images)
  phase 2: full train-step loss over many keys with a fixed checkpoint ->
           record the first key whose loss is non-finite, then bisect which
           batch element and which augmentation sub-op caused it.

Usage: TOY_ROOT=/tmp/toy_full python scripts_dev/nan_hunt.py [n_steps]
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from nndetection_tpu.data.aug_presets import get_augmentation
from nndetection_tpu.data.augment import augment_batch, generator_patch_size_for
from nndetection_tpu.data.loader import PatchLoader, build_case_records
from nndetection_tpu.utils.io import load_pickle


def main():
    root = Path(os.environ.get("TOY_ROOT", "/tmp/toy_full"))
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    task = root / "Task000D3_Example"
    plan = load_pickle(task / "preprocessed" / "D3V001_3d.pkl")
    aug_cfg = get_augmentation("base_more", tuple(plan.patch_size))
    gen_patch = generator_patch_size_for(aug_cfg)
    records = build_case_records(task / "preprocessed" / plan.plan_id / "imagesTr")
    loader = PatchLoader(
        records,
        patch_size=gen_patch,
        batch_size=plan.batch_size,
        max_instances=plan.max_instances_per_patch,
        seed=123,
        inner_patch_size=tuple(plan.patch_size),
    )

    aug = jax.jit(lambda k, im, seg: augment_batch(k, im, seg, aug_cfg))
    key = jax.random.PRNGKey(7)
    bad = []
    for i in range(n_steps):
        batch = loader.generate_batch()
        key, sub = jax.random.split(key)
        data, seg = aug(sub, jnp.asarray(batch["images"]), jnp.asarray(batch["seg_instances"]))
        finite = jax.device_get(
            jnp.isfinite(data.astype(jnp.float32)).all(axis=tuple(range(1, data.ndim)))
        )
        if not finite.all():
            bad.append((i, np.where(~finite)[0].tolist()))
            np.savez(
                f"/tmp/nan_repro_{i}.npz",
                images=np.asarray(batch["images"], np.float32),
                seg=np.asarray(batch["seg_instances"], np.int32),
                key=np.asarray(sub),
            )
            print(f"step {i}: NONFINITE augmented images, items {bad[-1][1]} "
                  f"-> saved /tmp/nan_repro_{i}.npz", flush=True)
            if len(bad) >= 3:
                break
        if i % 50 == 0:
            print(f"step {i}: clean", flush=True)
    print(f"done: {len(bad)} non-finite augment outputs in {n_steps} steps")


if __name__ == "__main__":
    main()
