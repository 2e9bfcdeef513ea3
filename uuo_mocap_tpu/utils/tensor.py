"""Device placement helpers (reference ``utils/tensor.py:5-10``:
``dict2device`` — in JAX, explicit placement via ``jax.device_put``)."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax


def dict2device(tree: Dict[str, Any], device: Optional[Any] = None) -> Dict[str, Any]:
    """Move every array leaf of a dict/pytree onto ``device``
    (default: the first addressable device)."""
    device = device or jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device) if hasattr(x, "shape") else x, tree
    )
