"""Learned SDF-based marker->surface attachment (use_sdf marker-stage mode).

Capability match for the reference's ``utils/sdf.py:9-85``: ``PosDiff``
projects an off-surface point onto the template surface, ``Pos2BC``
converts the projected point to a soft barycentric one-hot over vertices,
and the inverse maps a one-hot back to a 3D point on the template.  The
reference additionally memoizes a precomputed SDF *grid*
(``data/smpl_sdf.npz``, built by ``vis/vis_sdf.py``); here the grid
builder lives in ``build_sdf_grid`` using the closed-form point-triangle
kernel instead of libigl.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.models.checkpoints import load_params
from uuo_mocap_tpu.models.pos2bc import Pos2BC
from uuo_mocap_tpu.models.pos_diff import PosDiff


class SDF:
    def __init__(self, body: BodyModel, pos2bc_params=None, pos_diff_params=None,
                 checkpoint_root: Optional[str] = None):
        self.body = body
        self.pos2bc = Pos2BC(num_vertices=body.num_vertices)
        self.pos_diff = PosDiff()
        if checkpoint_root is not None:
            rng = jax.random.PRNGKey(0)
            t2bc = self.pos2bc.init(rng, jnp.zeros((1, 3)))
            tdiff = self.pos_diff.init(rng, jnp.zeros((1, 3)))
            pos2bc_params = load_params(t2bc, checkpoint_root, "barycentric_coords/pos2bc")
            pos_diff_params = load_params(tdiff, checkpoint_root, "barycentric_coords/pos_diff")
        self.pos2bc_params = pos2bc_params
        self.pos_diff_params = pos_diff_params

    def points_to_barycentric_one_hot(self, points: jnp.ndarray) -> jnp.ndarray:
        """[M, 3] -> [M, V] soft assignment: PosDiff projection then Pos2BC
        softmax (reference ``utils/sdf.py:47-78``)."""
        projected = points + self.pos_diff.apply(self.pos_diff_params, points)
        logits = self.pos2bc.apply(self.pos2bc_params, projected)
        return jax.nn.softmax(logits, axis=-1)

    def barycentric_one_hot_to_points(self, one_hot: jnp.ndarray) -> jnp.ndarray:
        """[M, V] -> [M, 3] on the template (reference ``utils/sdf.py:80-85``)."""
        return jnp.einsum("mv,vd->md", one_hot, self.body.v_template)


def build_sdf_grid(
    body: BodyModel, resolution: Tuple[int, int, int] = (64, 64, 32), pad: float = 0.1,
) -> Dict[str, np.ndarray]:
    """Precompute an unsigned-distance grid around the template body
    (the reference builds ``data/smpl_sdf.npz`` at 512x512x128 with libigl,
    ``vis/vis_sdf.py:12-46``; same schema, closed-form kernel)."""
    from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance

    v = np.asarray(body.v_template)
    lo = v.min(0) - pad
    hi = v.max(0) + pad
    axes = [np.linspace(lo[d], hi[d], resolution[d], dtype=np.float32) for d in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    verts = jnp.asarray(v)[None]
    faces = jnp.asarray(body.faces)
    dists = []
    chunk = 2048
    for i in range(0, grid.shape[0], chunk):
        out = point_mesh_distance(jnp.asarray(grid[i : i + chunk])[None], verts, faces)
        dists.append(np.asarray(out["distance"][0]))
    d = np.concatenate(dists).reshape(resolution)
    return {"sdf": d, "lower": lo, "upper": hi, "resolution": np.asarray(resolution)}
