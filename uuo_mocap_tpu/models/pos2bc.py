"""Point -> soft barycentric one-hot over SMPL vertices (Flax).

Capability match for the reference's ``models/pos2bc.py:5-24``: MLP
3 -> 128 -> 1024 -> 6890 mapping an (approximately on-surface) point to a
soft assignment over template vertices, used by the SDF-based marker stage
(reference ``utils/sdf.py:15-19``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from uuo_mocap_tpu.body.model import NUM_VERTICES


class Pos2BC(nn.Module):
    hidden: int = 128
    wide: int = 1024
    num_vertices: int = NUM_VERTICES

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] -> [..., V] logits."""
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.wide)(h))
        return nn.Dense(self.num_vertices)(h)
