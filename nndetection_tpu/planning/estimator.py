"""HBM budget estimation for the self-configuration loop.

Replaces the reference's live CUDA probing (10 real AMP train steps measuring
``torch.cuda.memory_reserved``,
``/root/reference/nndet/planning/estimator.py:63-258``) with two TPU-native
estimators (SURVEY.md §7.1.5):

* ``compile``: lower + compile the actual jitted train step and read XLA's
  ``memory_analysis()`` — exact, but requires a TPU backend and pays a
  compile per candidate.
* ``analytic``: closed-form activation accounting of the RetinaUNet topology
  (fwd + bwd activations, params, optimizer state, rematerialization factor)
  — instant, used during planning loops and on CPU.

The default budget models a TPU v5e chip (16 GB HBM) with a safety margin,
mirroring the RTX2080TI budget constants of the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from nndetection_tpu.models.encoder import encoder_channels, encoder_strides
from nndetection_tpu.models.decoder import ufpn_out_channels

# v5e: 16 GiB HBM; leave headroom for XLA scratch, infeed and fragmentation
V5E_HBM_BYTES = 16 * 1024**3
DEFAULT_BUDGET = int(V5E_HBM_BYTES * 0.85)


@dataclass
class MemoryEstimate:
    total_bytes: int
    breakdown: Dict[str, int]

    def fits(self, budget: int = DEFAULT_BUDGET) -> bool:
        return self.total_bytes <= budget


def analytic_estimate(
    patch_size: Sequence[int],
    batch_size: int,
    in_channels: int,
    conv_kernels,
    strides,
    decoder_levels,
    start_channels: int = 32,
    max_channels: int = 320,
    fpn_channels: int = 128,
    head_channels: int = 128,
    anchors_per_loc: int = 27,
    num_classes: int = 1,
    bytes_per_el: int = 2,  # bf16 activations
    activation_factor: float = 3.0,  # fwd + grads + workspace
) -> MemoryEstimate:
    """Closed-form activation/parameter accounting of the RetinaUNet."""
    dim = len(patch_size)
    num_stages = len(conv_kernels)
    channels = encoder_channels(num_stages, start_channels, max_channels)
    strides_abs = encoder_strides(num_stages, strides, dim)
    dec_channels = ufpn_out_channels(num_stages, decoder_levels, fpn_channels)

    def stage_voxels(stage):
        return int(
            np.prod([int(np.ceil(p / s)) for p, s in zip(patch_size, strides_abs[stage])])
        )

    # encoder: 2 convs per stage
    enc = sum(2 * stage_voxels(s) * channels[s] for s in range(num_stages))
    # decoder: lateral + upsample per level
    dec = sum(2 * stage_voxels(s) * dec_channels[s] for s in range(num_stages))
    # heads: towers on decoder levels (classifier + regressor, 2+ convs each)
    heads = sum(
        2 * 2 * stage_voxels(s) * head_channels for s in decoder_levels
    )
    # head outputs
    outs = sum(
        stage_voxels(s) * anchors_per_loc * (num_classes + 2 * dim)
        for s in decoder_levels
    )
    seg = stage_voxels(0) * 2
    act_bytes = (
        (enc + dec + heads + outs + seg)
        * batch_size
        * bytes_per_el
        * activation_factor
    )

    # parameters: rough conv accounting (kernels ~3^dim)
    param_count = 0
    for s in range(num_stages):
        cin = in_channels if s == 0 else channels[s - 1]
        param_count += (cin * channels[s] + channels[s] * channels[s]) * 3**dim
        param_count += channels[s] * dec_channels[s]  # lateral
    param_count += 2 * (fpn_channels * head_channels + head_channels * head_channels) * 3**dim
    # params + grads + SGD momentum, fp32
    param_bytes = param_count * 4 * 3

    # anchors/matching workspace: IoU [G, A] fp32 etc.
    anchors_total = sum(stage_voxels(s) * anchors_per_loc for s in decoder_levels)
    match_bytes = batch_size * anchors_total * (32 * 4 + 2 * dim * 4)

    total = int(act_bytes + param_bytes + match_bytes)
    return MemoryEstimate(
        total_bytes=total,
        breakdown={
            "activations": int(act_bytes),
            "params_opt": int(param_bytes),
            "matching": int(match_bytes),
        },
    )


def compile_estimate(
    train_step_fn, sample_args, donate_argnums=()
) -> Optional[MemoryEstimate]:
    """Exact XLA memory analysis of a jitted train step. Returns None when the
    backend does not expose the analysis (e.g. CPU)."""
    import jax

    try:
        lowered = jax.jit(train_step_fn, donate_argnums=donate_argnums).lower(
            *sample_args
        )
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        # peak = args + outputs + temps, minus buffers aliased by donation
        # (donated inputs are reused as outputs, not live twice)
        total = int(
            getattr(ma, "temp_size_in_bytes", 0)
            + getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            - getattr(ma, "alias_size_in_bytes", 0)
        )
        return MemoryEstimate(
            total_bytes=total,
            breakdown={
                "temp": int(getattr(ma, "temp_size_in_bytes", 0)),
                "args": int(getattr(ma, "argument_size_in_bytes", 0)),
                "out": int(getattr(ma, "output_size_in_bytes", 0)),
            },
        )
    except Exception:  # noqa: BLE001 — estimation must never break planning
        return None


def probe_train_step_estimate(
    model_cfg, batch_size: int, max_instances: int = 32
) -> Optional[MemoryEstimate]:
    """Compile the candidate architecture's ACTUAL train step (forward + loss
    + grads + SGD update) against abstract inputs and return XLA's memory
    analysis — the TPU-native replacement for the reference's live 10-step
    VRAM probe (``/root/reference/nndet/planning/estimator.py:107-258``).

    ``jax.jit(...).lower`` accepts ``ShapeDtypeStruct``s, so no real buffers
    are allocated; the cost is one (remote, on TPU) compile per call. State
    args are donated to match the real trainer's aliasing, so the analysis
    reflects the true peak. Returns ``None`` when the backend exposes no
    memory analysis (e.g. CPU) or the probe fails.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from nndetection_tpu.models.retina_unet import RetinaUNet, train_step_loss

    try:
        model = RetinaUNet(model_cfg)
        anchors_np, per_level = model_cfg.anchors()
        tx = optax.chain(
            optax.clip_by_global_norm(12.0),
            optax.sgd(0.01, momentum=0.9, nesterov=True),
        )

        def step(params, opt_state, batch, anchors, key):
            def loss_fn(p):
                preds = model.apply(p, batch["images"])
                losses = train_step_loss(
                    model_cfg, preds, anchors, per_level, batch, key
                )
                return (
                    losses["cls"]
                    + losses["reg"]
                    + losses["seg_ce"]
                    + losses["seg_dice"]
                )

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        ps = tuple(model_cfg.patch_size)
        g = int(max_instances)
        sd = jax.ShapeDtypeStruct
        sample = sd((1, *ps, model_cfg.in_channels), jnp.float32)
        key = sd((2,), jnp.uint32)
        params = jax.eval_shape(model.init, key, sample)
        opt_state = jax.eval_shape(tx.init, params)
        batch = {
            "images": sd((batch_size, *ps, model_cfg.in_channels), jnp.float32),
            "gt_boxes": sd((batch_size, g, 2 * model_cfg.dim), jnp.float32),
            "gt_classes": sd((batch_size, g), jnp.int32),
            "gt_mask": sd((batch_size, g), jnp.bool_),
            "seg": sd((batch_size, *ps), jnp.int32),
        }
        anchors = sd(anchors_np.shape, jnp.float32)
        return compile_estimate(
            step, (params, opt_state, batch, anchors, key), donate_argnums=(0, 1)
        )
    except Exception:  # noqa: BLE001 — estimation must never break planning
        return None
