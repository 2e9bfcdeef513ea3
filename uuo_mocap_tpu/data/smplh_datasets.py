"""Surface-sample datasets for Pos2BC / PosDiff training.

Ports of the reference's ``datasets/smplh_dataset.py`` (random barycentric
surface samples with part-weighted face selection -> soft vertex one-hot
targets) and ``datasets/smplh_diff_dataset.py`` (uniform samples in a padded
AABB projected to the surface -> (pos, pos_diff) pairs; the reference
projects with libigl, here the closed-form point-triangle kernel).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel


class SMPLHDataset:
    """Random on-surface samples + barycentric one-hot targets
    (reference ``smplh_dataset.py:74-117``)."""

    def __init__(self, body: BodyModel, parts: Optional[Sequence[int]] = None, seed: int = 0):
        self.body = body
        self.rng = np.random.RandomState(seed)
        self.vertices = np.asarray(body.v_template)
        self.faces = body.faces
        # part-weighted face selection (``face_weights``, reference :43-58)
        vertex_labels = np.asarray(jnp.argmax(body.lbs_weights, axis=-1))
        if parts is not None:
            keep = np.isin(vertex_labels[self.faces].max(axis=1), np.asarray(list(parts)))
            self.face_ids = np.where(keep)[0]
        else:
            self.face_ids = np.arange(self.faces.shape[0])
        # area-weighted sampling
        tri = self.vertices[self.faces[self.face_ids]]
        areas = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
        self.face_probs = areas / areas.sum()

    def sample(self, n: int) -> Dict[str, np.ndarray]:
        fidx = self.face_ids[self.rng.choice(len(self.face_ids), n, p=self.face_probs)]
        bary = self.rng.dirichlet((1.0, 1.0, 1.0), size=n).astype(np.float32)
        tri = self.vertices[self.faces[fidx]]
        pos = np.einsum("nk,nkd->nd", bary, tri).astype(np.float32)
        one_hot = np.zeros((n, self.body.num_vertices), np.float32)
        rows = np.arange(n)[:, None].repeat(3, 1)
        np.add.at(one_hot, (rows, self.faces[fidx]), bary)
        return {"pos": pos, "barycentric_one_hot": one_hot, "face_ids": fidx, "barycentric": bary}

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        out = self.sample(1)
        return {k: v[0] for k, v in out.items()}

    def __len__(self) -> int:
        return 1 << 20


class SMPLHDiffDataset:
    """Uniform AABB samples + displacement-to-surface targets
    (reference ``smplh_diff_dataset.py:84-94``)."""

    def __init__(self, body: BodyModel, pad: float = 0.1, seed: int = 0):
        self.body = body
        self.rng = np.random.RandomState(seed)
        v = np.asarray(body.v_template)
        self.lower = v.min(0) - pad
        self.upper = v.max(0) + pad

    def sample(self, n: int) -> Dict[str, np.ndarray]:
        from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance

        pos = self.rng.uniform(self.lower, self.upper, (n, 3)).astype(np.float32)
        out = point_mesh_distance(
            jnp.asarray(pos)[None], jnp.asarray(self.body.v_template)[None], jnp.asarray(self.body.faces)
        )
        closest = np.asarray(out["closest_point"][0])
        return {"pos": pos, "pos_diff": closest - pos, "closest": closest}

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        out = self.sample(1)
        return {k: v[0] for k, v in out.items()}

    def __len__(self) -> int:
        return 1 << 20
