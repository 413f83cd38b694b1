"""Fused conv+IN-stats kernel (ops/pallas_conv.py) vs the XLA composition.

Interpret mode on CPU: validates the conv arithmetic (halos, SAME padding,
tap indexing), the cross-grid statistics accumulation, and the custom VJP
against jax.vjp of the unfused reference composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nndetection_tpu.ops.pallas_conv import conv3d_in_stats, supported


def _ref(x, w):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    mean = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
    var = jnp.mean(
        (y.astype(jnp.float32) - mean[:, None, None, None, :]) ** 2, axis=(1, 2, 3)
    )
    return y, mean, var


@pytest.mark.parametrize(
    "shape,ci,co",
    [
        ((2, 8, 8, 8), 8, 16),
        ((1, 12, 16, 16), 16, 16),
        ((2, 6, 8, 8), 1, 8),  # stem-like C_in=1
    ],
)
def test_forward_matches_xla(shape, ci, co):
    rng = np.random.default_rng(0)
    b, d, h, w = shape
    x = rng.normal(size=(b, d, h, w, ci)).astype(np.float32)
    wk = (rng.normal(size=(3, 3, 3, ci, co)) * 0.1).astype(np.float32)

    y, mean, var = conv3d_in_stats(jnp.asarray(x), jnp.asarray(wk))
    yr, mr, vr = _ref(jnp.asarray(x), jnp.asarray(wk))

    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=1e-2, rtol=1e-2
    )
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mr), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(vr), rtol=5e-3, atol=2e-3)


def test_supported_predicate():
    assert supported((2, 8, 16, 16, 8), (3, 3, 3), (1, 1, 1), 3)
    assert not supported((2, 8, 16, 16, 8), (3, 3, 3), (2, 2, 2), 3)
    assert not supported((2, 8, 16, 16, 8), (1, 1, 1), (1, 1, 1), 3)
    assert not supported((2, 8, 16, 16, 8), (3, 3), (1, 1), 2)


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    b, d, h, w, ci, co = 1, 6, 8, 8, 8, 8
    x = rng.normal(size=(b, d, h, w, ci)).astype(np.float32)
    wk = (rng.normal(size=(3, 3, 3, ci, co)) * 0.1).astype(np.float32)

    def loss_fused(x, wk):
        y, mean, var = conv3d_in_stats(x, wk)
        inv = jax.lax.rsqrt(var + 1e-5)
        yn = (y.astype(jnp.float32) - mean[:, None, None, None, :]) * inv[
            :, None, None, None, :
        ]
        return jnp.sum(jnp.tanh(yn) * 0.01)

    def loss_ref(x, wk):
        y, mean, var = _ref(x, wk)
        inv = jax.lax.rsqrt(var + 1e-5)
        yn = (y.astype(jnp.float32) - mean[:, None, None, None, :]) * inv[
            :, None, None, None, :
        ]
        return jnp.sum(jnp.tanh(yn) * 0.01)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(wk))
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(wk))

    np.testing.assert_allclose(
        np.asarray(gx_f, np.float32), np.asarray(gx_r, np.float32),
        atol=5e-4, rtol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(gw_f, np.float32), np.asarray(gw_r, np.float32),
        atol=5e-3, rtol=5e-2,
    )


def test_model_level_parity(monkeypatch):
    """Same params, fused vs XLA path: identical tree, close outputs."""
    from nndetection_tpu.models.blocks import StackedConvBlock

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 16, 16, 4)).astype(np.float32)

    blk = StackedConvBlock(out_channels=8, dim=3, act="leaky_relu")
    monkeypatch.delenv("NNDET_CONV_FUSED", raising=False)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(blk.apply(params, jnp.asarray(x)), np.float32)

    monkeypatch.setenv("NNDET_CONV_FUSED", "1")
    params_f = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    fused = np.asarray(blk.apply(params, jnp.asarray(x)), np.float32)
    # bf16 compute; normalized activations O(1)
    np.testing.assert_allclose(fused, ref, atol=3e-2, rtol=3e-2)
