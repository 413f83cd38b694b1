"""Fused Pallas instance norm vs the XLA two-pass reference: forward values,
gradients (dx, dgamma, dbeta), module-level parameter compatibility, and the
no-clean-chunk fallback path. Runs in Pallas interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nndetection_tpu.ops.pallas_norm import _pick_chunk, fused_instance_norm


def reference_in(x, gamma, beta, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * inv * gamma + beta).astype(x.dtype)


class TestPickChunk:
    def test_divides(self):
        for s in (16 * 3, 96 * 128 * 128, 48 * 64 * 64, 24 * 32 * 32, 40 * 80):
            for c in (8, 32, 128, 320):
                chunk = _pick_chunk(s, c)
                if chunk:
                    assert s % chunk == 0
                    assert chunk % 8 == 0

    def test_prime_spatial_falls_back(self):
        assert _pick_chunk(17 * 13, 32) == 0


class TestForward:
    @pytest.mark.parametrize(
        "shape", [(2, 8, 16, 16, 8), (2, 32, 32, 16), (1, 16, 16, 16, 32)]
    )
    def test_matches_reference_f32(self, shape):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.standard_normal(shape) * 2 + 1.5, jnp.float32)
        gamma = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        got = fused_instance_norm(x, gamma, beta)
        want = reference_in(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_bf16_input(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 16)), jnp.bfloat16)
        gamma = jnp.ones(16, jnp.float32)
        beta = jnp.zeros(16, jnp.float32)
        got = fused_instance_norm(x, gamma, beta)
        want = reference_in(x, gamma, beta)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.02
        )

    def test_high_mean_low_variance_robust(self):
        """The exact failure mode of the naive one-pass E[x^2]-E[x]^2: large
        mean, tiny variance (SNR 3e4). At this ratio even the f32 ulp of the
        mean is ~1% of sigma, so the fair criterion is error against an
        exact float64 ground truth, no worse than the XLA two-pass path."""
        rng = np.random.RandomState(2)
        xf64 = rng.standard_normal((1, 16, 16, 8)) * 1e-2 + 300.0
        x = jnp.asarray(xf64, jnp.float32)
        gamma = jnp.ones(8, jnp.float32)
        beta = jnp.zeros(8, jnp.float32)
        # float64 ground truth (numpy, exact for this purpose)
        mean64 = xf64.mean(axis=(1, 2), keepdims=True)
        var64 = xf64.var(axis=(1, 2), keepdims=True)
        truth = (xf64 - mean64) / np.sqrt(var64 + 1e-5)
        got = np.asarray(fused_instance_norm(x, gamma, beta), np.float64)
        ref = np.asarray(reference_in(x, gamma, beta), np.float64)
        err_fused = np.abs(got - truth).max()
        err_xla = np.abs(ref - truth).max()
        assert np.isfinite(got).all()
        # the naive one-pass variant produced rsqrt blow-ups here (unit-std
        # violated by orders of magnitude); Welford/Chan must stay sane and
        # no worse than the production two-pass path
        assert 0.9 < got.std() < 1.1
        assert err_fused <= max(2.0 * err_xla, 1e-4), (err_fused, err_xla)

    def test_fallback_path_matches(self):
        """Spatial size with no multiple-of-8 divisor -> XLA fallback."""
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.standard_normal((2, 13, 17, 4)), jnp.float32)
        assert _pick_chunk(13 * 17, 4) == 0
        got = fused_instance_norm(x, jnp.ones(4), jnp.zeros(4))
        want = reference_in(x, jnp.ones(4), jnp.zeros(4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestBackward:
    def test_grads_match_reference(self):
        rng = np.random.RandomState(4)
        shape = (2, 8, 16, 16, 8)
        x = jnp.asarray(rng.standard_normal(shape) + 0.7, jnp.float32)
        gamma = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        t = jnp.asarray(rng.standard_normal(shape), jnp.float32)

        def loss_fused(x, g, b):
            return jnp.sum(fused_instance_norm(x, g, b) * t)

        def loss_ref(x, g, b):
            return jnp.sum(reference_in(x, g, b) * t)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b_, name in zip(gf, gr, ("dx", "dgamma", "dbeta")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3,
                err_msg=name,
            )

    def test_grads_match_on_fallback(self):
        rng = np.random.RandomState(5)
        shape = (1, 13, 17, 4)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        t = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        g = jnp.ones(4)
        b = jnp.zeros(4)
        gf = jax.grad(lambda x: jnp.sum(fused_instance_norm(x, g, b) * t))(x)
        gr = jax.grad(lambda x: jnp.sum(reference_in(x, g, b) * t))(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=3e-5)


class TestModuleIntegration:
    def test_param_compatible_and_equal(self, monkeypatch):
        """InstanceNorm under NNDET_IN_IMPL=pallas must use the same param
        tree and produce the same output as the default two-pass module."""
        from nndetection_tpu.models.conv import InstanceNorm

        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 8)), jnp.float32)
        mod = InstanceNorm(dtype=jnp.float32)
        monkeypatch.delenv("NNDET_IN_IMPL", raising=False)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(params, x)
        monkeypatch.setenv("NNDET_IN_IMPL", "pallas")
        params2 = mod.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
        got = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5
        )
