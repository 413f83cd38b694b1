import jax
import numpy as np
import jax.numpy as jnp

from nndetection_tpu.core.boxes import (
    BalancedHardNegativeSampler,
    HardNegativeSamplerBatched,
    HardNegativeSamplerFgAll,
)


def make_labels(rng, n=4096, n_pos=30, n_ignore=50):
    labels = np.zeros(n, np.int32)
    idx = rng.choice(n, n_pos + n_ignore, replace=False)
    labels[idx[:n_pos]] = 1
    labels[idx[n_pos:]] = -1
    probs = rng.uniform(0, 1, n).astype(np.float32)
    return labels, probs


class TestHardNegativeSamplerBatched:
    def test_counts(self, rng):
        labels, probs = make_labels(rng, n_pos=30)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=32, positive_fraction=0.33, pool_size=20, batch_size=4
        )
        pos, neg = s(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(probs))
        pos, neg = np.asarray(pos), np.asarray(neg)
        # pos cap = int(32*4*0.33) = 42 > 30 available -> all 30
        assert pos.sum() == 30
        # num_neg = int(30 * |1 - 1/0.33|) = int(30*2.0303..) = 60
        assert neg.sum() == int(30 * abs(1 - 1 / 0.33))
        assert not (pos & (labels != 1)).any()
        assert not (neg & (labels != 0)).any()
        assert not (pos & neg).any()

    def test_pos_cap_enforced(self, rng):
        labels, probs = make_labels(rng, n_pos=500)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=32, positive_fraction=0.33, batch_size=4
        )
        pos, neg = s(jax.random.PRNGKey(1), jnp.asarray(labels), jnp.asarray(probs))
        assert np.asarray(pos).sum() == int(32 * 4 * 0.33)

    def test_negatives_from_hard_pool(self, rng):
        labels, probs = make_labels(rng, n_pos=10)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=32, positive_fraction=0.33, pool_size=20, batch_size=1
        )
        pos, neg = s(jax.random.PRNGKey(2), jnp.asarray(labels), jnp.asarray(probs))
        neg = np.asarray(neg)
        num_neg = neg.sum()
        pool = int(num_neg * 20)
        neg_scores = np.where(labels == 0, probs, -np.inf)
        pool_thresh = np.sort(neg_scores)[::-1][pool - 1]
        assert (probs[neg] >= pool_thresh).all()

    def test_min_neg(self, rng):
        labels = np.zeros(1000, np.int32)  # no positives at all
        probs = rng.uniform(0, 1, 1000).astype(np.float32)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=32, positive_fraction=0.33, min_neg=1, batch_size=1
        )
        pos, neg = s(jax.random.PRNGKey(3), jnp.asarray(labels), jnp.asarray(probs))
        assert np.asarray(pos).sum() == 0
        # num_neg = max(1, 0->1) * 2.03 = 2
        assert np.asarray(neg).sum() >= 1

    def test_randomness_differs_by_key(self, rng):
        labels, probs = make_labels(rng, n_pos=200)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=32, positive_fraction=0.33, batch_size=1
        )
        p1, n1 = s(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(probs))
        p2, n2 = s(jax.random.PRNGKey(7), jnp.asarray(labels), jnp.asarray(probs))
        assert (np.asarray(p1) != np.asarray(p2)).any()

    def test_uniform_positive_coverage(self, rng):
        """Every positive should be selectable (distribution sanity)."""
        labels, probs = make_labels(rng, n=256, n_pos=20, n_ignore=0)
        s = HardNegativeSamplerBatched(
            batch_size_per_image=8, positive_fraction=0.5, batch_size=1
        )
        seen = np.zeros(256, bool)
        for k in range(40):
            pos, _ = s(jax.random.PRNGKey(k), jnp.asarray(labels), jnp.asarray(probs))
            seen |= np.asarray(pos)
        assert seen[labels == 1].sum() >= 18  # nearly all positives sampled


class TestVariants:
    def test_balanced(self, rng):
        labels, probs = make_labels(rng, n_pos=25)
        s = BalancedHardNegativeSampler(
            batch_size_per_image=32, positive_fraction=0.33, batch_size=4
        )
        pos, neg = s(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(probs))
        assert np.asarray(neg).sum() == np.asarray(pos).sum() == 25

    def test_fg_all(self, rng):
        labels, probs = make_labels(rng, n_pos=40)
        s = HardNegativeSamplerFgAll(negative_ratio=2.0)
        pos, neg = s(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(probs))
        assert np.asarray(pos).sum() == 40  # all positives
        assert np.asarray(neg).sum() == 80
