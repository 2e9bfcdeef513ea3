"""Off-surface point -> nearest-surface-point displacement (Flax).

Capability match for the reference's ``models/pos_diff.py:5-24``: MLP
3 -> 128 -> 128 -> 3 learning the projection of a point near the template
body onto its surface (a learned SDF gradient step), used by the SDF-based
marker stage (reference ``utils/sdf.py:22-26``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PosDiff(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] point -> [..., 3] displacement to the surface."""
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(3)(h)
