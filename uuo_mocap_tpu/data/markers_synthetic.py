"""Synthetic marker containers (Markers-compatible API).

Ports of the reference's ``markers/markers_synthetic.py`` (random surface
markers from SMPL sequences) and ``markers/markers_synthetic_structured.py``
(real marker layouts at known vertex ids + 9.5 mm offset, optional part
filtering).  Motion comes from AMASS npz files when supplied, else from the
procedural generator (AMASS itself is not vendorable).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.joints import SMPL_LIMBS
from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.data.marker_layout import (
    compute_markers_from_layout,
    compute_marker_labels_from_layout,
    resolve_layout_vertex_ids,
)
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, random_pose_sequence
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline.stages import SmplParams


def _params_from_amass(npz_path: str) -> tuple[SmplParams, float]:
    """AMASS-processed npz (poses [F, 66+], betas, trans, mocap_frame_rate)
    -> SmplParams."""
    data = np.load(npz_path)
    poses = np.asarray(data["poses"], np.float32)
    F = poses.shape[0]
    aa = poses[:, : 24 * 3].reshape(F, 24, 3)
    mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
    betas = jnp.asarray(np.asarray(data["betas"], np.float32)[:10][None])
    trans = jnp.asarray(np.asarray(data["trans"], np.float32))
    freq = float(data.get("mocap_frame_rate", 30.0))
    return SmplParams(mats[:, 1:], betas, mats[:, :1], trans), freq


class MarkersSynthetic(ArrayMarkers):
    """Random surface-sampled virtual markers (reference
    ``markers_synthetic.py:18-90``)."""

    def __init__(
        self,
        model: BodyModel,
        amass_npz: Optional[str] = None,
        num_frames: int = 150,
        num_markers: int = 41,
        seed: int = 0,
        freq: float = 30.0,
        occlusion_rate: float = 0.0,
        shuffle: bool = False,
    ):
        if amass_npz is not None:
            params, freq = _params_from_amass(amass_npz)
        else:
            params = random_pose_sequence(num_frames, seed=seed)
        mk = generate_markers(
            model, params, num_markers=num_markers, seed=seed, freq=freq,
            occlusion_rate=occlusion_rate, shuffle=shuffle,
        )
        super().__init__(np.asarray(mk.points), freq=freq)
        self.gt_params = params
        self.vertex_ids = mk.vertex_ids


class MarkersSyntheticStructured(ArrayMarkers):
    """Layout-based virtual markers with optional part filtering (reference
    ``markers_synthetic_structured.py:14-98``)."""

    def __init__(
        self,
        model: BodyModel,
        layout: str = "cmu_41",
        amass_npz: Optional[str] = None,
        num_frames: int = 150,
        seed: int = 0,
        freq: float = 30.0,
        parts: Optional[List[str]] = None,  # limb names from SMPL_LIMBS
        vid_table=None,
        shuffle: bool = False,
    ):
        if amass_npz is not None:
            params, freq = _params_from_amass(amass_npz)
        else:
            params = random_pose_sequence(num_frames, seed=seed)
        F = params.trans.shape[0]
        out = lbs_forward(
            model, params.pose_body, jnp.broadcast_to(params.betas, (F, 10)),
            params.root_orient, params.trans,
        )
        vids = resolve_layout_vertex_ids(layout, model, vid_table)
        layout_out = compute_markers_from_layout(out["vertices"][None], model.faces, vids)
        points = np.asarray(layout_out["marker_pos"][0])  # [F, M, 3]
        labels = np.asarray(compute_marker_labels_from_layout(vids, model.lbs_weights))

        if parts:
            keep_joints = set()
            for p in parts:
                keep_joints.update(SMPL_LIMBS[p])
            keep = np.asarray([l in keep_joints for l in labels])
            points = points[:, keep]
            vids = vids[keep]
            labels = labels[keep]

        if shuffle:
            rng = np.random.RandomState(seed)
            for f in range(points.shape[0]):
                points[f] = points[f, rng.permutation(points.shape[1])]

        super().__init__(points, freq=freq)
        self.gt_params = params
        self.vertex_ids = vids
        self.marker_labels = labels
