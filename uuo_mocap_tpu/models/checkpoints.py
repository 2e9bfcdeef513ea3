"""Model checkpoint save/load.

The reference loads torch ``.pth`` state dicts from ``./checkpoints/...``
(``markers_utils.py:45-48``, ``utils/sdf.py:15-26``) but does not ship the
training code or the checkpoints (SURVEY.md §5.4).  Here checkpoints are
flax msgpack files under the same directory convention, written by the
training loops in ``models/train.py``.
"""
from __future__ import annotations

import os
from typing import Any

from flax import serialization


def checkpoint_path(root: str, name: str) -> str:
    return os.path.join(root, name, "final", "model.msgpack")


def save_params(params: Any, root: str, name: str) -> str:
    path = checkpoint_path(root, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(template: Any, root: str, name: str) -> Any:
    """Restore into ``template``'s structure; leaves are cast to the
    template's dtypes, so checkpoints stored downcast (e.g. the 7M-param
    Pos2BC shipped as float16 to halve repo size) load as float32
    transparently."""
    path = checkpoint_path(root, name)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda t, s: jnp.asarray(s, getattr(t, "dtype", None)), template, restored
    )
