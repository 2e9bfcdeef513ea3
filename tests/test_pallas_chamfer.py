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


def test_ranked_nearest_frame_blocked():
    """Frame-blocked ranking kernel vs brute force, incl. a ragged frame
    count (F not a multiple of F_BLOCK) and a vertex-subset bias."""
    from uuo_mocap_tpu.ops.chamfer_pallas import F_BLOCK, ranked_nearest_pallas

    F, M, V = 2 * F_BLOCK + 3, 17, 700
    x = RNG.randn(F, M, 3).astype(np.float32)
    y = (RNG.randn(F, V, 3) + [1.0, 0.0, -2.0]).astype(np.float32)
    _, ref_idx = brute(x, y, np.zeros((F, V), np.float32))
    idx = ranked_nearest_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True)
    assert idx.shape == (F, M)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    # per-lane vertex exclusion (the part-fit use): masked vertices never win
    keep = (RNG.rand(V) > 0.6).astype(np.float32)
    bias = (1.0 - keep) * 1e10
    _, ref_idx_b = brute(x, y, np.broadcast_to(bias, (F, V)).astype(np.float32))
    idx_b = ranked_nearest_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_b), ref_idx_b)
    assert keep[np.asarray(idx_b).ravel()].all()


def test_ranked_nearest_vmaps_over_lanes():
    """The lane vmap in the stage programs must compose with the kernel."""
    import jax

    from uuo_mocap_tpu.ops.chamfer_pallas import ranked_nearest_pallas

    L, F, M, V = 3, 10, 8, 300
    x = RNG.randn(L, F, M, 3).astype(np.float32)
    y = RNG.randn(L, F, V, 3).astype(np.float32)
    bias = np.zeros((L, V), np.float32)
    bias[:, ::2] = 1e10
    idx = jax.vmap(lambda a, b, c: ranked_nearest_pallas(a, b, c, interpret=True))(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias))
    for l in range(L):
        _, ref_idx = brute(x[l], y[l], np.broadcast_to(bias[l], (F, V)))
        np.testing.assert_array_equal(np.asarray(idx[l]), ref_idx)
