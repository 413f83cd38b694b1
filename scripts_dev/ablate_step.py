"""Ablation timing of train-step components on the real TPU.

All variants chain their output back into the next iteration's input so the
wall-clock measurement is forced by data dependencies (block_until_ready via
the tunnel is not reliable for unchained outputs).

Variants:
  full      : aug + gt_prep + forward + ATSS + sampling + losses + grads + sgd
  no_aug    : prepared targets, no augmentation inside the step
  no_match  : dummy labels (skip ATSS+sampling), losses on fixed masks
  conv_only : forward + backward on a surrogate loss (mean of outputs)
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import luna_cfg, make_batch
from nndetection_tpu.data.augment import AugmentConfig, augment_batch, get_generator_patch_size
from nndetection_tpu.data.gt_prep import prepare_targets
from nndetection_tpu.models import RetinaUNet, train_step_loss
from nndetection_tpu import losses as L

T00 = time.time()


def log(msg):
    print(f"[{time.time()-T00:7.1f}s] {msg}", flush=True)


PATCH = (96, 128, 128)
BATCH = 4
N = 8

cfg = luna_cfg(PATCH)
model = RetinaUNet(cfg)
aug = AugmentConfig(patch_size=cfg.patch_size)
gp = get_generator_patch_size(PATCH)
rng = np.random.RandomState(0)
raw = {k: jnp.asarray(v) for k, v in make_batch(rng, BATCH, gp).items()}
anchors_np, per_level = cfg.anchors()
anchors = jnp.asarray(anchors_np)
key0 = jax.random.PRNGKey(0)

params = jax.jit(model.init)(key0, jnp.zeros((1, *PATCH, 1), jnp.float32))
tx = optax.sgd(1e-4, momentum=0.9)
opt0 = tx.init(params)
log(f"init done; anchors={anchors_np.shape[0]}")

# device-side prepared batch (for no_aug variant)
prep = jax.jit(lambda im, seg, tab: prepare_targets(
    jax.image.resize(im, (BATCH, *PATCH, 1), "nearest"),
    jax.image.resize(seg.astype(jnp.float32), (BATCH, *PATCH), "nearest").astype(jnp.int32),
    tab))(raw["images"], raw["seg_instances"], raw["instance_classes"])
jax.block_until_ready(prep)
log("prepared batch done")


def timed(name, fn, state0):
    state = fn(state0, jnp.int32(0))  # compile
    jax.block_until_ready(state)
    log(f"{name}: compiled")
    t0 = time.time()
    for i in range(N):
        state = fn(state, jnp.int32(i))
    jax.block_until_ready(state)
    dt = (time.time() - t0) / N
    log(f"{name}: {dt*1000:.0f} ms/step ({BATCH/dt:.2f} patches/s)")


def total_of(losses):
    return losses["cls"] + losses["reg"] + losses["seg_ce"] + losses["seg_dice"]


# ---- full step -----------------------------------------------------------
@jax.jit
def full_step(carry, i):
    params, opt = carry
    key = jax.random.fold_in(key0, i)
    k_aug, k = jax.random.split(key)
    d, s = augment_batch(k_aug, raw["images"], raw["seg_instances"], aug)
    batch = prepare_targets(d, s, raw["instance_classes"])

    def loss_fn(p):
        preds = model.apply(p, batch["images"])
        return total_of(train_step_loss(cfg, preds, anchors, per_level, batch, k))

    g = jax.grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt


# ---- no_aug --------------------------------------------------------------
@jax.jit
def no_aug_step(carry, i):
    params, opt = carry
    k = jax.random.fold_in(key0, i)

    def loss_fn(p):
        preds = model.apply(p, prep["images"])
        return total_of(train_step_loss(cfg, preds, anchors, per_level, prep, k))

    g = jax.grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt


# ---- no_match (dummy labels/masks; keeps losses + convs) -----------------
A = anchors_np.shape[0]
fixed_labels = jnp.zeros((BATCH * A,), jnp.int32).at[:128].set(1)
fixed_pos = jnp.zeros((BATCH * A,), bool).at[:64].set(True)
fixed_sample = jnp.zeros((BATCH * A,), bool).at[:256].set(True)
matched_boxes = jnp.tile(anchors, (BATCH, 1))


@jax.jit
def no_match_step(carry, i):
    params, opt = carry
    k = jax.random.fold_in(key0, i)

    def loss_fn(p):
        preds = model.apply(p, prep["images"])
        logits = preds["box_logits"].reshape(-1, cfg.classifier_classes)
        deltas = preds["box_deltas"].reshape(-1, 6)
        from nndetection_tpu.core.boxes.coder import BoxCoder

        pred_boxes = BoxCoder(dim=3).decode(deltas, matched_boxes)
        cls = L.bce_one_hot(logits, fixed_labels, fixed_sample, cfg.classifier_classes)
        reg = L.giou_loss(pred_boxes, matched_boxes, fixed_pos)
        seg = L.softmax_ce_loss(preds["seg_logits"], prep["seg"]) + L.soft_dice_loss(
            preds["seg_logits"], prep["seg"]
        )
        return cls + reg + seg

    g = jax.grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt


# ---- conv_only -----------------------------------------------------------
@jax.jit
def conv_only_step(carry, i):
    params, opt = carry

    def loss_fn(p):
        preds = model.apply(p, prep["images"])
        return (
            jnp.mean(preds["box_logits"])
            + jnp.mean(preds["box_deltas"])
            + jnp.mean(preds["seg_logits"])
        )

    g = jax.grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {
        "conv_only": conv_only_step,
        "no_match": no_match_step,
        "no_aug": no_aug_step,
        "full": full_step,
    }
    for name, fn in fns.items():
        if which not in ("all", name):
            continue
        timed(name, fn, (params, opt0))
