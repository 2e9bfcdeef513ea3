"""Learned foot-contact detector over HMR joint streams (Flax).

Capability match for the reference's ``models/foot_contact_model.py:6-52``:
temporal conv stack over the joint stream -> per-frame left/right contact
logits (the pipeline's default uses the heuristic in
``utils/foot_contact.py``; this is the learned alternative).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FootContactModel(nn.Module):
    latent_dim: int = 64
    num_joints: int = 22

    @nn.compact
    def __call__(self, joints: jnp.ndarray) -> jnp.ndarray:
        """joints [N, F, J, 3] -> logits [N, F, 2]."""
        N, F, J, _ = joints.shape
        x = joints - jnp.mean(joints, axis=(1, 2), keepdims=True)
        x = x.reshape(N, F, J * 3)
        for _ in range(3):
            x = nn.relu(nn.Conv(self.latent_dim, kernel_size=(5,), padding="SAME")(x))
        return nn.Dense(2)(x)
