"""Hard-negative anchor sampling with static shapes.

Reimplements the reference's sampler family
(``/root/reference/nndet/core/boxes/sampler.py:101-338``) as masked, jit-safe
selection: instead of ``randperm`` + index compaction, uniform random
priorities are drawn per anchor and ``lax.top_k`` with *static* caps selects
the sample; the dynamic sample counts (which depend on the number of positives
found) only enter through comparisons against position ranks, never through
array shapes.

The sampling distribution matches the reference exactly:

* positives: uniform without replacement, ``min(#pos, batch_size * fraction)``
* negatives: pool of the ``num_neg * pool_size`` highest-scoring negatives,
  then uniform without replacement from the pool with
  ``num_neg = clamp(max(1, num_pos) * (1/fraction - 1), min_neg, #neg)``
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _select_topk_mask(
    key: jax.Array,
    eligible: jnp.ndarray,
    num_select,
    cap: int,
) -> jnp.ndarray:
    """Uniformly select ``min(num_select, #eligible)`` elements (static cap).

    Returns a boolean mask of the same shape as ``eligible``.
    """
    n = eligible.shape[0]
    priorities = jnp.where(
        eligible, jax.random.uniform(key, (n,)), -jnp.inf
    )
    vals, idx = jax.lax.top_k(priorities, cap)
    take = (jnp.arange(cap) < num_select) & jnp.isfinite(vals)
    scatter_idx = jnp.where(take, idx, n)
    return (
        jnp.zeros((n,), dtype=bool).at[scatter_idx].set(True, mode="drop")
    )


class HardNegativeSamplerBatched:
    """Batch-level hard negative mining (the reference default,
    ``sampler.py:212-270``). Operates on the flattened ``[B*A]`` label/score
    arrays so positives/negatives balance across the whole batch."""

    def __init__(
        self,
        batch_size_per_image: int = 32,
        positive_fraction: float = 0.33,
        min_neg: int = 1,
        pool_size: float = 20.0,
        batch_size: int = 1,
        approx_topk: bool = True,
    ):
        """``approx_topk`` uses ``jax.lax.approx_max_k`` (the TPU-optimized
        partial-reduction top-k, recall ~0.95) for the hard-negative pool —
        the pool is a stochastic candidate set, so approximate membership at
        the boundary does not change the sampling semantics meaningfully,
        while exact ``top_k`` costs a large sort over every anchor."""
        self.batch_size_per_image = batch_size_per_image
        self.positive_fraction = positive_fraction
        self.min_neg = min_neg
        self.pool_size = pool_size
        self.batch_size = batch_size
        self.approx_topk = approx_topk
        total = batch_size_per_image * batch_size
        self.pos_cap = max(1, int(total * positive_fraction))
        neg_per_pos = abs(1.0 - 1.0 / positive_fraction)
        self.neg_cap = max(min_neg, int(max(1, self.pos_cap) * neg_per_pos) + 1)
        self.pool_cap = max(self.neg_cap, int(self.neg_cap * pool_size))

    def _num_neg(self, num_pos: jnp.ndarray, num_neg_avail: jnp.ndarray) -> jnp.ndarray:
        neg_per_pos = abs(1.0 - 1.0 / self.positive_fraction)
        num_neg = (jnp.maximum(1, num_pos) * neg_per_pos).astype(jnp.int32)
        return jnp.minimum(num_neg_avail, jnp.maximum(num_neg, self.min_neg))

    def __call__(
        self,
        key: jax.Array,
        target_labels: jnp.ndarray,
        fg_probs: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
            key: PRNG key
            target_labels: per-anchor labels, flattened over the batch ``[N]``
                (>=1 fg, 0 bg, -1 ignore)
            fg_probs: max foreground probability per anchor ``[N]``

        Returns:
            ``(pos_mask [N], neg_mask [N])`` boolean sampling masks.
        """
        kp, kn = jax.random.split(key)
        positive = target_labels >= 1
        negative = target_labels == 0

        num_pos_avail = jnp.sum(positive)
        num_pos = jnp.minimum(num_pos_avail, self.pos_cap)
        pos_mask = _select_topk_mask(kp, positive, num_pos, self.pos_cap)

        num_neg_avail = jnp.sum(negative)
        num_neg = self._num_neg(num_pos, num_neg_avail)

        # hard-negative pool: top (num_neg * pool_size) scoring negatives
        pool_size = jnp.minimum(
            num_neg_avail, (num_neg * self.pool_size).astype(jnp.int32)
        )
        neg_scores = jnp.where(negative, fg_probs, -jnp.inf)
        if self.approx_topk and neg_scores.shape[0] > 4 * self.pool_cap:
            pool_vals, pool_idx = jax.lax.approx_max_k(neg_scores, self.pool_cap)
        else:
            pool_vals, pool_idx = jax.lax.top_k(neg_scores, self.pool_cap)
        pool_valid = (jnp.arange(self.pool_cap) < pool_size) & jnp.isfinite(pool_vals)

        # uniform choice of num_neg from the pool
        pri = jnp.where(
            pool_valid, jax.random.uniform(kn, (self.pool_cap,)), -jnp.inf
        )
        pvals, porder = jax.lax.top_k(pri, self.neg_cap)
        take = (jnp.arange(self.neg_cap) < num_neg) & jnp.isfinite(pvals)
        chosen = jnp.where(take, pool_idx[porder], target_labels.shape[0])
        neg_mask = (
            jnp.zeros(target_labels.shape, dtype=bool)
            .at[chosen]
            .set(True, mode="drop")
        )
        return pos_mask, neg_mask


class BalancedHardNegativeSampler(HardNegativeSamplerBatched):
    """Same pool mechanics but ``num_neg = max(num_pos, 1)``
    (``sampler.py:273-287``)."""

    def _num_neg(self, num_pos, num_neg_avail):
        return jnp.minimum(num_neg_avail, jnp.maximum(num_pos, 1))


class HardNegativeSamplerFgAll(HardNegativeSamplerBatched):
    """Use *all* positives; sample ``negative_ratio * num_pos`` hard negatives
    (``sampler.py:290-338``)."""

    def __init__(self, negative_ratio: float = 1.0, pool_size: float = 20.0,
                 batch_size: int = 1, max_anchors: int = 1 << 16):
        super().__init__(
            batch_size_per_image=1,
            positive_fraction=0.5,
            min_neg=1,
            pool_size=pool_size,
            batch_size=batch_size,
        )
        self.negative_ratio = negative_ratio
        # all positives may be used; caps scale with anchor count
        self.pos_cap = max_anchors
        self.neg_cap = max_anchors
        self.pool_cap = max_anchors

    def __call__(self, key, target_labels, fg_probs):
        positive = target_labels >= 1
        negative = target_labels == 0
        num_pos = jnp.sum(positive)
        num_neg = jnp.minimum(
            jnp.sum(negative),
            jnp.maximum((self.negative_ratio * num_pos).astype(jnp.int32), 1),
        )
        pool_size = jnp.minimum(
            jnp.sum(negative), (num_neg * self.pool_size).astype(jnp.int32)
        )
        neg_scores = jnp.where(negative, fg_probs, -jnp.inf)
        cap = min(self.pool_cap, target_labels.shape[0])
        pool_vals, pool_idx = jax.lax.top_k(neg_scores, cap)
        pool_valid = (jnp.arange(cap) < pool_size) & jnp.isfinite(pool_vals)
        pri = jnp.where(pool_valid, jax.random.uniform(key, (cap,)), -jnp.inf)
        pvals, porder = jax.lax.top_k(pri, cap)
        take = (jnp.arange(cap) < num_neg) & jnp.isfinite(pvals)
        chosen = jnp.where(take, pool_idx[porder], target_labels.shape[0])
        neg_mask = (
            jnp.zeros(target_labels.shape, dtype=bool)
            .at[chosen]
            .set(True, mode="drop")
        )
        return positive, neg_mask
