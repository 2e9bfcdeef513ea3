"""Pallas fused nearest-vertex kernel vs the XLA oracle (interpret mode on
CPU; the same kernel compiles natively on TPU — see ops/chamfer_pallas.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.ops.chamfer_pallas import M_PAD, min_sqdist_pallas

RNG = np.random.RandomState(9)


def brute(x, y, bias):
    d2 = np.sum((x[..., :, None, :] - y[..., None, :, :]) ** 2, -1) + bias[..., None, :]
    return d2.min(-1), d2.argmin(-1)


def test_matches_bruteforce():
    B, M, V = 3, 41, 700
    x = RNG.randn(B, M, 3).astype(np.float32)
    y = (RNG.randn(B, V, 3) + [2.0, -1.0, 0.5]).astype(np.float32)
    bias = np.zeros((B, V), np.float32)
    val, idx = min_sqdist_pallas(jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias), interpret=True)
    ref_val, ref_idx = brute(x, y, bias)
    np.testing.assert_allclose(np.asarray(val), ref_val, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_vertex_mask_bias():
    B, M, V = 2, 10, 300
    x = RNG.randn(B, M, 3).astype(np.float32)
    y = RNG.randn(B, V, 3).astype(np.float32)
    mask = (RNG.rand(V) > 0.5).astype(np.float32)
    bias = np.broadcast_to((1.0 - mask) * 1e10, (B, V)).astype(np.float32)
    val, idx = min_sqdist_pallas(jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias), interpret=True)
    ref_val, ref_idx = brute(x, y, bias)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    # every selected vertex is unmasked
    assert mask[np.asarray(idx).ravel()].all()


def test_m_limit():
    x = jnp.zeros((1, M_PAD + 1, 3))
    y = jnp.zeros((1, 50, 3))
    with pytest.raises(ValueError):
        min_sqdist_pallas(x, y, jnp.zeros((1, 50)), interpret=True)
