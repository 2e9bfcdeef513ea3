"""AMASS-backed training datasets + preprocessing.

Ports of the reference's ``datasets/dataset_mocap.py`` (windowed SMPL pose
sequences + virtual surface markers + augmentations),
``datasets/dataset_smplh_motion.py`` (pose-only sequences), and
``datasets/preprocess_amass_data.py`` (raw AMASS npz -> processed npz at
30 Hz with precomputed foot contacts).  AMASS itself is licensed, so loaders
read user-supplied files; the procedural generator doubles as the data
source when none exist.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.data.synthetic import random_pose_sequence
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline.stages import SmplParams
from uuo_mocap_tpu.settings import MARKER_DISTANCE
from uuo_mocap_tpu.utils.foot_contact import compute_foot_contacts

# AMASS sub-dataset splits (reference ``dataset_mocap.py:37-41``)
SPLITS = {
    "train": ["ACCAD", "BioMotionLab_NTroje", "BMLmovi", "EKUT", "Eyes_Japan_Dataset", "KIT", "MPI_Limits"],
    "valid": ["SFU", "BMLhandball"],
}


def preprocess_amass_npz(src: str, dst: str, target_freq: float = 30.0,
                         body: Optional[BodyModel] = None) -> str:
    """Raw AMASS npz -> processed npz: resample to 30 Hz, float32, precompute
    foot contacts via the SMPL forward (reference
    ``preprocess_amass_data.py:12-110``)."""
    data = np.load(src, allow_pickle=True)
    freq = float(data.get("mocap_framerate", data.get("mocap_frame_rate", 120.0)))
    poses = np.asarray(data["poses"], np.float32)
    trans = np.asarray(data["trans"], np.float32)
    betas = np.asarray(data["betas"], np.float32)[:10]

    stride = max(int(round(freq / target_freq)), 1)
    poses = poses[::stride]
    trans = trans[::stride]

    out = {
        "poses": poses,
        "trans": trans,
        "betas": betas,
        "mocap_frame_rate": target_freq,
        "gender": str(data.get("gender", "neutral")),
    }
    if body is not None:
        F = poses.shape[0]
        aa = poses[:, : 24 * 3].reshape(F, 24, 3)
        mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
        fwd = lbs_forward(
            body, mats[:, 1:], jnp.broadcast_to(jnp.asarray(betas)[None], (F, 10)),
            mats[:, :1], jnp.asarray(trans),
        )
        out["foot_contacts"] = compute_foot_contacts(np.asarray(fwd["joints"])[None, :, :22])[0]
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    np.savez(dst, **out)
    return dst


# ------------------------------------------------------------- augmentations
def apply_random_rotation_to_pos(pos: np.ndarray, rng: np.random.RandomState) -> Tuple[np.ndarray, np.ndarray]:
    """Random yaw about the up axis (reference ``dataset_mocap.py:209-236``)."""
    angle = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return pos @ R.T, R


def apply_random_translation_to_pos(pos: np.ndarray, rng: np.random.RandomState, scale: float = 1.0) -> np.ndarray:
    """(reference ``dataset_mocap.py:239-254``)."""
    offset = rng.uniform(-scale, scale, 3).astype(np.float32)
    offset[2] = 0.0
    return pos + offset


def world_to_local_pos(pos: np.ndarray, root_pos: np.ndarray) -> np.ndarray:
    """Center a point stream on the root trajectory (reference
    ``dataset_mocap.py:257-288``)."""
    return pos - root_pos[:, None, :]


class DatasetMocap:
    """Windowed synthetic-marker training dataset (reference
    ``dataset_mocap.py:15-151``).

    ``amass_dir`` layout: <amass_dir>/<sub_dataset>/<subject>/<seq>.npz
    (processed).  Without a directory, procedural sequences are generated on
    the fly — same sample schema either way.
    """

    def __init__(
        self,
        body: BodyModel,
        amass_dir: Optional[str] = None,
        split: str = "train",
        sequence_length: int = 32,
        stride: int = 4,
        num_markers: int = 41,
        seed: int = 0,
    ):
        self.body = body
        self.sequence_length = sequence_length
        self.stride = stride
        self.num_markers = num_markers
        self.rng = np.random.RandomState(seed)
        self.vertex_labels = np.asarray(jnp.argmax(body.lbs_weights, axis=-1))

        self.files: List[str] = []
        if amass_dir is not None and os.path.isdir(amass_dir):
            for sub in SPLITS.get(split, []):
                sub_dir = os.path.join(amass_dir, sub)
                if not os.path.isdir(sub_dir):
                    continue
                for root, _dirs, files in os.walk(sub_dir):
                    self.files += [os.path.join(root, f) for f in files if f.endswith(".npz")]
        self.files.sort()

    def _load_params(self, index: int) -> SmplParams:
        span = self.sequence_length * self.stride
        if self.files:
            path = self.files[index % len(self.files)]
            data = np.load(path)
            poses = np.asarray(data["poses"], np.float32)
            F = poses.shape[0]
            start = self.rng.randint(0, max(F - span, 1))
            sel = slice(start, min(start + span, F), self.stride)
            aa = poses[sel, : 24 * 3].reshape(-1, 24, 3)
            mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
            betas = jnp.asarray(np.asarray(data["betas"], np.float32)[:10][None])
            trans = jnp.asarray(np.asarray(data["trans"], np.float32)[sel])
            return SmplParams(mats[:, 1:], betas, mats[:, :1], trans)
        return random_pose_sequence(self.sequence_length, seed=int(self.rng.randint(1 << 30)))

    def compute_markers(self, params: SmplParams) -> Dict[str, np.ndarray]:
        """Random barycentric surface markers + face-normal x 9.5 mm offset
        (reference ``dataset_mocap.py:109-151``)."""
        F = params.trans.shape[0]
        out = lbs_forward(
            self.body, params.pose_body, jnp.broadcast_to(params.betas, (F, 10)),
            params.root_orient, params.trans,
        )
        verts = np.asarray(out["vertices"])  # [F, V, 3]
        faces = self.body.faces
        fidx = self.rng.randint(0, faces.shape[0], self.num_markers)
        bary = self.rng.dirichlet((1.0, 1.0, 1.0), size=self.num_markers).astype(np.float32)
        tri = verts[:, faces[fidx]]  # [F, M, 3verts, 3]
        pts = np.einsum("mk,fmkd->fmd", bary, tri)
        n = np.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        labels = self.vertex_labels[faces[fidx][:, 0]]
        return {
            "markers": (pts + n * MARKER_DISTANCE).astype(np.float32),
            "marker_labels": labels,
            "joints": np.asarray(out["joints"][:, :22]),
        }

    def __len__(self) -> int:
        return len(self.files) if self.files else 1 << 16

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        params = self._load_params(index)
        sample = self.compute_markers(params)
        markers, R = apply_random_rotation_to_pos(sample["markers"], self.rng)
        markers = apply_random_translation_to_pos(markers, self.rng)
        sample["markers"] = markers
        return sample


class DatasetSMPLHMotion:
    """Pose-sequence-only dataset (reference ``dataset_smplh_motion.py:12``)."""

    def __init__(self, body: BodyModel, amass_dir: Optional[str] = None,
                 split: str = "train", sequence_length: int = 64, seed: int = 0):
        self.inner = DatasetMocap(body, amass_dir, split, sequence_length, stride=1, seed=seed)

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        params = self.inner._load_params(index)
        return {
            "pose_body": np.asarray(params.pose_body),
            "root_orient": np.asarray(params.root_orient),
            "trans": np.asarray(params.trans),
            "betas": np.asarray(params.betas),
        }
