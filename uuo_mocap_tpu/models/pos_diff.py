"""Off-surface point -> nearest-surface-point displacement (Flax).

Capability match for the reference's ``models/pos_diff.py:5-24`` (an MLP
3 -> 128 -> 128 -> 3) learning the projection of a point near the template
body onto its surface (a learned SDF gradient step), used by the SDF-based
marker stage (reference ``utils/sdf.py:22-26``).

Deliberate upgrade over the reference architecture: the raw-coordinate MLP
plateaus at a ~20% residual reduction (spectral bias — the displacement
field has ~cm-scale structure near the surface that a 3-input ReLU MLP
cannot fit; measured round 4/5, Benchmarks.md).  A Fourier positional
encoding of the query point (NeRF-style sin/cos at octave frequencies)
lifts the input to a basis where the field is low-frequency.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def fourier_features(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[..., D] -> [..., D * (1 + 2 * num_freqs)]: identity + sin/cos at
    octave frequencies 2^k * pi (coords are in meters, body ~O(1))."""
    if num_freqs <= 0:
        return x
    freqs = jnp.asarray(2.0 ** np.arange(num_freqs) * np.pi, x.dtype)
    ang = x[..., None] * freqs  # [..., D, K]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


class PosDiff(nn.Module):
    hidden: int = 256
    num_freqs: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] point -> [..., 3] displacement to the surface."""
        h = fourier_features(x, self.num_freqs)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(3)(h)
