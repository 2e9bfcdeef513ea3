"""Determinism helpers (reference ``utils/random_utils.py:5-12``)."""
from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> "jax.Array":
    """Seed python/numpy and return a jax PRNG key (jax has no global seed —
    thread the returned key through jax-side sampling)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
