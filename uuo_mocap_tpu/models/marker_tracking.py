"""Experimental marker relabeling models (Flax).

Capability match for the reference's ``models/marker_tracking.py:30-91``
(not wired into its pipeline either): ``PermutationLearningModel`` predicts
a per-frame soft permutation matrix (Ghorbani et al. 2019 style);
``MarkerTrackingAttention`` runs a transformer encoder over the frame x
marker token grid.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def sinkhorn(log_alpha: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Normalize a score matrix into a doubly-stochastic soft permutation."""
    for _ in range(iters):
        log_alpha = log_alpha - jax.nn.logsumexp(log_alpha, axis=-1, keepdims=True)
        log_alpha = log_alpha - jax.nn.logsumexp(log_alpha, axis=-2, keepdims=True)
    return jnp.exp(log_alpha)


import jax  # noqa: E402  (used by sinkhorn)


class PermutationLearningModel(nn.Module):
    """[N, F, M, 3] -> per-frame soft permutation [N, F, M, M]."""

    latent_dim: int = 128
    num_markers: int = 41

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        N, F, M, _ = points.shape
        x = points - jnp.mean(points, axis=2, keepdims=True)
        h = nn.relu(nn.Dense(self.latent_dim)(x.reshape(N, F, M * 3)))
        h = h + nn.relu(nn.Dense(self.latent_dim)(h))  # residual block
        scores = nn.Dense(M * M)(h).reshape(N, F, M, M)
        return sinkhorn(scores)


class MarkerTrackingAttention(nn.Module):
    """Transformer encoder over F*M marker tokens -> per-marker id logits."""

    latent_dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    num_markers: int = 41

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """[N, F, M, 3] -> [N, F, M, num_markers] id logits."""
        N, F, M, _ = points.shape
        x = nn.Dense(self.latent_dim)(points)  # [N, F, M, D]
        x = x.reshape(N, F * M, self.latent_dim)
        for _ in range(self.num_layers):
            attn = nn.SelfAttention(num_heads=self.num_heads)(x)
            x = nn.LayerNorm()(x + attn)
            mlp = nn.Dense(self.latent_dim)(nn.relu(nn.Dense(self.latent_dim * 2)(x)))
            x = nn.LayerNorm()(x + mlp)
        return nn.Dense(self.num_markers)(x).reshape(N, F, M, self.num_markers)
