"""Multimodal (markers + video joints) part segmenter (Flax).

Capability match for the reference's
``models/marker_segmenter_multimodal.py:9-171``: the marker branch of
:class:`MarkerSegmenter` fused with an embedding of the HMR 22-joint
stream; the joint branch's max-pooled global feature conditions every
marker's classification.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from uuo_mocap_tpu.models.marker_segmenter import (
    NUM_PARTS, STRIDE, WINDOW, marker_window_features)


class MarkerSegmenterMultimodal(nn.Module):
    latent_dim: int = 128
    num_classes: int = NUM_PARTS
    num_joints: int = 22

    @nn.compact
    def __call__(self, points: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
        """points [N, F, M, 3], joints [N, F, J, 3] -> logits [N, M, C]."""
        N, F, M, _ = points.shape

        x = nn.relu(nn.Dense(self.latent_dim)(marker_window_features(points)))

        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N * M, F, self.latent_dim)
        for pool in (4, 4, 2):
            x = nn.relu(nn.Conv(self.latent_dim, kernel_size=(3,), padding="SAME")(x))
            x = nn.max_pool(x[..., None], (pool, 1), strides=(pool, 1))[..., 0]
        x = jnp.mean(x, axis=1).reshape(N, M, self.latent_dim)

        # video branch: embed HMR joints (kept per-joint — joint IDENTITY is
        # the video stream's whole value), temporal conv, global pooling
        j_center = jnp.mean(joints, axis=(1, 2), keepdims=True)
        j = (joints - j_center).reshape(N, F, -1)  # [N, F, J*3], joints ordered
        j = nn.relu(nn.Dense(self.latent_dim)(j))
        j = nn.relu(nn.Conv(self.latent_dim, kernel_size=(3,), padding="SAME")(j))
        j_global = jnp.max(j, axis=1, keepdims=True)  # [N, 1, D]

        # fuse (local, marker-global, video-global), then marker self-
        # attention (same rationale as MarkerSegmenter: pairwise relational
        # geometry over 41 tokens)
        m_global = jnp.max(x, axis=1, keepdims=True)  # [N, 1, D]
        fused = jnp.concatenate(
            [x, jnp.broadcast_to(m_global, x.shape),
             jnp.broadcast_to(j_global, x.shape)], axis=-1)
        x = nn.relu(nn.Dense(self.latent_dim)(fused))
        for _ in range(2):
            a = nn.SelfAttention(num_heads=4, qkv_features=self.latent_dim)(x)
            x = nn.LayerNorm()(x + a)
            h2 = nn.Dense(self.latent_dim)(nn.relu(nn.Dense(self.latent_dim * 2)(x)))
            x = nn.LayerNorm()(x + h2)

        h = nn.relu(nn.Dense(self.latent_dim * 2)(x))
        return nn.Dense(self.num_classes)(h)

    def forward_sequence(self, params, points: jnp.ndarray, joints: jnp.ndarray,
                         freq: float = 30.0, target_freq: float = 30.0) -> jnp.ndarray:
        """Windowed full-sequence inference (reference
        ``marker_segmenter_multimodal.py:117-171``)."""
        F, M, _ = points.shape
        temporal_stride = max(int(freq // target_freq), 1)
        full_stride = STRIDE * temporal_stride
        span = full_stride * WINDOW

        probs = jnp.zeros((F, M, self.num_classes))
        for start in range(0, F, span):
            w_pts = points[start : start + span : full_stride][None]
            w_jts = joints[start : start + span : full_stride][None]
            W = w_pts.shape[1]
            if W < WINDOW:
                w_pts = jnp.concatenate([w_pts, jnp.repeat(w_pts[:, -1:], WINDOW - W, axis=1)], axis=1)
                w_jts = jnp.concatenate([w_jts, jnp.repeat(w_jts[:, -1:], WINDOW - W, axis=1)], axis=1)
            logits = self.apply(params, w_pts, w_jts)[0]
            probs = probs.at[start : start + span].set(jax.nn.softmax(logits, axis=-1)[None])
        return probs
