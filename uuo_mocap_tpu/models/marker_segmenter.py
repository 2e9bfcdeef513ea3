"""Per-marker body-part classifier (Flax).

Capability match for the reference's ``models/marker_segmenter.py:6-135``
(torch): embed each marker position, convolve over time, pool a global
cloud feature, and classify every marker into one of 24 SMPL parts.
Re-designed for TPU: the temporal convs run as feature-last ``Conv``
(XLA lowers to MXU matmuls), markers are a batch-like axis (the classifier
is permutation-equivariant over markers by construction), and
``forward_sequence`` tiles long clips into 32-frame windows at stride 4
like the reference (``marker_segmenter.py:106-135``).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_PARTS = 24
WINDOW = 32
STRIDE = 4


def marker_window_features(points: jnp.ndarray) -> jnp.ndarray:
    """[N, F, M, 3] -> [N, F, M, 7] per-marker-frame features: cloud-
    centered position (3), per-frame velocity (3, forward diff), and height
    above the cloud minimum (1, gravity prior — yaw-invariant).

    The raw-position net of round 4 plateaued at 37% held-out accuracy;
    motion signatures and height separate limbs the static cloud cannot
    (measured round 5, checkpoints/MANIFEST.json)."""
    center = jnp.mean(points, axis=(1, 2), keepdims=True)
    x = points - center
    vel = jnp.diff(points, axis=1, append=points[:, -1:])  # [N, F, M, 3]
    height = (points[..., 1:2]
              - jnp.min(points[..., 1:2], axis=(1, 2), keepdims=True))
    return jnp.concatenate([x, vel, height], axis=-1)


class MarkerSegmenter(nn.Module):
    latent_dim: int = 128
    num_classes: int = NUM_PARTS

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """points [N, F, M, 3] -> logits [N, M, num_classes].

        Featurize (centered pos + velocity + height), embed, temporal conv
        + pool per marker, then TWO rounds of global-context fusion
        (PointNet-segmentation style: local/global concat, re-embed,
        re-pool) before the per-marker classifier.
        """
        N, F, M, _ = points.shape
        x = nn.relu(nn.Dense(self.latent_dim)(marker_window_features(points)))

        # temporal tower: treat (N*M) as batch, F as the conv axis
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N * M, F, self.latent_dim)
        for pool in (4, 4, 2):
            x = nn.Conv(self.latent_dim, kernel_size=(3,), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x[..., None], (pool, 1), strides=(pool, 1))[..., 0]
        x = jnp.mean(x, axis=1)  # [N*M, D] temporal pooling
        x = x.reshape(N, M, self.latent_dim)

        # global-context fusion, then marker self-attention: relative
        # marker-to-marker geometry (above/below, left-limb/right-limb) is
        # what separates parts, and pairwise attention models it directly
        # where repeated max-pool concat cannot (41 tokens — trivial cost)
        global_feat = jnp.max(x, axis=1, keepdims=True)  # [N, 1, D]
        x = jnp.concatenate([x, jnp.broadcast_to(global_feat, x.shape)], axis=-1)
        x = nn.relu(nn.Dense(self.latent_dim)(x))
        for _ in range(2):
            a = nn.SelfAttention(num_heads=4, qkv_features=self.latent_dim)(x)
            x = nn.LayerNorm()(x + a)
            h = nn.Dense(self.latent_dim)(nn.relu(nn.Dense(self.latent_dim * 2)(x)))
            x = nn.LayerNorm()(x + h)

        x = nn.relu(nn.Dense(self.latent_dim * 2)(x))
        return nn.Dense(self.num_classes)(x)  # [N, M, C]

    def forward_sequence(self, params, points: jnp.ndarray, freq: float = 30.0,
                         target_freq: float = 30.0) -> jnp.ndarray:
        """Full-sequence inference: slide WINDOW-frame windows at STRIDE x
        (freq/target) and splat per-window softmax back onto frames
        (reference ``segment_markers``, ``markers_utils.py:34-76``).

        points [F, M, 3] -> per-frame class probabilities [F, M, C].
        """
        F, M, _ = points.shape
        temporal_stride = max(int(freq // target_freq), 1)
        full_stride = STRIDE * temporal_stride
        span = full_stride * WINDOW

        probs = jnp.zeros((F, M, self.num_classes))
        for start in range(0, F, span):
            window = points[start : start + span : full_stride][None]  # [1, W', M, 3]
            W = window.shape[1]
            if W < WINDOW:  # pad by repeating the last frame
                pad = jnp.repeat(window[:, -1:], WINDOW - W, axis=1)
                window = jnp.concatenate([window, pad], axis=1)
            logits = self.apply(params, window)[0]  # [M, C]
            p = jax.nn.softmax(logits, axis=-1)
            probs = probs.at[start : start + span].set(p[None])
        return probs
