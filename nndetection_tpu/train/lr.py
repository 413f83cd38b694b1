"""Learning-rate schedules as optax-compatible functions.

Mirrors ``/root/reference/nndet/training/learning_rate.py:27-230``:
linear warmup -> per-step poly decay (gamma 0.9), and the cyclic-linear
schedule used during SWA epochs.
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_poly_lr(
    initial_lr: float,
    warm_iterations: int,
    warm_lr: float,
    poly_gamma: float,
    num_iterations: int,
):
    """Schedule fn: step -> lr. ``num_iterations`` includes warmup."""
    poly_iterations = max(1, num_iterations - warm_iterations)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warm_lr + (initial_lr - warm_lr) * (step + 1.0) / max(warm_iterations, 1)
        it = jnp.clip(step - warm_iterations, 0, poly_iterations - 1)
        poly = initial_lr * (1.0 - it / poly_iterations) ** poly_gamma
        return jnp.where(step < warm_iterations, warm, poly)

    return schedule


def cyclic_linear_lr(
    cycle_num_iterations: int,
    cycle_initial_lr: float,
    cycle_final_lr: float,
):
    """Per-cycle linear decay from initial to final lr (SWA phase,
    ``learning_rate.py:187-230``)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cyc = jnp.mod(step, cycle_num_iterations)
        mult = 1.0 - cyc / cycle_num_iterations
        return cycle_final_lr + (cycle_initial_lr - cycle_final_lr) * mult

    return schedule


def swa_schedule(
    initial_lr: float,
    warm_iterations: int,
    warm_lr: float,
    poly_gamma: float,
    train_iterations: int,
    swa_cycle_iterations: int,
):
    """Composite: warmup+poly for the main run, cyclic-linear
    ``initial_lr/10 -> initial_lr/1000`` per epoch afterwards
    (``/root/reference/nndet/training/swa.py:34-166``)."""
    main = linear_warmup_poly_lr(
        initial_lr, warm_iterations, warm_lr, poly_gamma, train_iterations
    )
    cyc = cyclic_linear_lr(swa_cycle_iterations, initial_lr / 10.0, initial_lr / 1000.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < train_iterations, main(step), cyc(step - train_iterations)
        )

    return schedule
