"""Batched similarity (Procrustes) alignment in JAX.

Replaces the reference's torch ``compute_similarity_transform``
(``evaluation/metrics.py:141-190``, from 4D-Humans): finds (s, R, t)
minimizing ||s R S1 + t - S2|| per batch element and returns the aligned S1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, N, 3] -> aligned S1 [B, N, 3]."""
    X1 = jnp.swapaxes(S1, -1, -2)  # [B, 3, N]
    X2 = jnp.swapaxes(S2, -1, -2)
    mu1 = jnp.mean(X1, axis=-1, keepdims=True)
    mu2 = jnp.mean(X2, axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c * X1c, axis=(-1, -2))  # [B]
    K = jnp.einsum("...in,...jn->...ij", X1c, X2c, precision=_P)  # [B, 3, 3]

    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vh, precision=_P))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[..., -1, -1].set(jnp.sign(det))
    R = jnp.einsum("...ij,...jk,...lk->...il", V, Z, U, precision=_P)  # V Z U^T

    trace = jnp.trace(jnp.einsum("...ij,...jk->...ik", R, K, precision=_P), axis1=-2, axis2=-1)
    scale = (trace / jnp.maximum(var1, 1e-12))[..., None, None]
    t = mu2 - scale * jnp.einsum("...ij,...jn->...in", R, mu1, precision=_P)
    S1_hat = scale * jnp.einsum("...ij,...jn->...in", R, X1c + mu1, precision=_P) + t
    return jnp.swapaxes(S1_hat, -1, -2)
