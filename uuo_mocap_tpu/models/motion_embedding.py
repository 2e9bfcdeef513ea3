"""Contrastive temporal-alignment embeddings (Flax).

Capability match for the reference's ``models/motion_embedding.py:8-187``:
``MarkerEmbedding`` / ``JointEmbedding`` map short motion windows to
normalized 32-d vectors trained contrastively so mocap and video windows of
the same instant embed nearby; ``TemporalAlignmentModel.compute_offset``
scores all offset pairs to synchronize the two clocks.  TPU re-design: the
O(F^2) embedding-distance matrix is one matmul instead of a Python double
loop.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _WindowEncoder(nn.Module):
    latent_dim: int = 64
    out_dim: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [N, W, K, 3] (window of K points/joints) -> [N, out_dim] unit.

        Positions + finite-difference velocities feed a two-layer point MLP;
        entity pooling keeps both mean and max so pose (not just extent)
        survives; temporal convs then summarize the window.
        """
        x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
        vel = jnp.concatenate([x[:, 1:] - x[:, :-1], jnp.zeros_like(x[:, :1])], axis=1)
        feat = jnp.concatenate([x, vel * 10.0], axis=-1)  # scale velocities up

        h = nn.relu(nn.Dense(self.latent_dim)(feat))
        h = nn.relu(nn.Dense(self.latent_dim)(h))  # [N, W, K, D]
        pooled = jnp.concatenate([jnp.max(h, axis=2), jnp.mean(h, axis=2)], axis=-1)  # [N, W, 2D]
        h = nn.relu(nn.Conv(self.latent_dim, kernel_size=(3,), padding="SAME")(pooled))
        h = nn.relu(nn.Conv(self.latent_dim, kernel_size=(3,), padding="SAME")(h))
        h = jnp.concatenate([jnp.mean(h, axis=1), jnp.max(h, axis=1)], axis=-1)  # [N, 2D]
        e = nn.Dense(self.out_dim)(nn.relu(nn.Dense(self.latent_dim)(h)))
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


class MarkerEmbedding(_WindowEncoder):
    """Windows of unlabeled markers -> 32-d (reference ``:8-53``)."""


class JointEmbedding(_WindowEncoder):
    """Windows of HMR joints -> 32-d (reference ``:56-103``)."""


class TemporalAlignmentModel:
    """Synchronize mocap and video clocks via embedding distances
    (reference ``motion_embedding.py:106-187``)."""

    def __init__(self, marker_params, joint_params, window: int = 16,
                 marker_model: MarkerEmbedding | None = None,
                 joint_model: JointEmbedding | None = None):
        self.window = window
        self.marker_model = marker_model or MarkerEmbedding()
        self.joint_model = joint_model or JointEmbedding()
        self.marker_params = marker_params
        self.joint_params = joint_params

    def embed_markers(self, markers: jnp.ndarray) -> jnp.ndarray:
        """[F, M, 3] -> [F - W + 1, 32] sliding-window embeddings."""
        F = markers.shape[0]
        W = self.window
        starts = jnp.arange(F - W + 1)
        windows = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(markers, s, W, 0))(starts)
        return self.marker_model.apply(self.marker_params, windows)

    def embed_joints(self, joints: jnp.ndarray) -> jnp.ndarray:
        F = joints.shape[0]
        W = self.window
        starts = jnp.arange(F - W + 1)
        windows = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(joints, s, W, 0))(starts)
        return self.joint_model.apply(self.joint_params, windows)

    def compute_offset(self, markers: jnp.ndarray, joints: jnp.ndarray) -> Tuple[int, jnp.ndarray]:
        """Best temporal offset (markers relative to joints) by minimizing the
        mean embedding distance along diagonals of the [Fm, Fj] cost matrix.
        One matmul replaces the reference's O(F^2) Python loop."""
        em = self.embed_markers(markers)  # [Fm, 32]
        ej = self.embed_joints(joints)  # [Fj, 32]
        sim = em @ ej.T  # [Fm, Fj] cosine similarity (unit vectors)
        cost = 1.0 - sim
        Fm, Fj = cost.shape
        offsets = jnp.arange(-(Fm - 1), Fj)

        def diag_mean(k):
            i = jnp.arange(max(Fm, Fj))
            ii = jnp.clip(i, 0, Fm - 1)
            jj = jnp.clip(i + k, 0, Fj - 1)
            valid = (i < Fm) & (i + k >= 0) & (i + k < Fj)
            vals = cost[ii, jj]
            return jnp.sum(jnp.where(valid, vals, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

        means = jax.vmap(diag_mean)(offsets)
        best = offsets[jnp.argmin(means)]
        return int(best), means
