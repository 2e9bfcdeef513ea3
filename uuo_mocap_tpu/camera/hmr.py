"""HMR 2.0 crop-camera model and projection — pure JAX.

Re-implements the camera machinery the reference adapted from 4D-Humans /
PHALP (``utils/hmr_utils.py:14-167``): weak-perspective crop camera ->
full-frame pinhole camera (FOCAL_LENGTH=5000 at a 256px crop), perspective
projection, and the HMR<->mocap axis swap (y-up camera frame vs z-up mocap
frame).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

FOCAL_LENGTH = 5000.0
IMG_SIZE = 256.0

_P = jax.lax.Precision.HIGHEST


def perspective_projection(
    points: jnp.ndarray,  # [B, N, 3]
    translation: jnp.ndarray,  # [B, 3]
    focal_length: jnp.ndarray,  # [B, 2]
    camera_center: Optional[jnp.ndarray] = None,  # [B, 2]
    rotation: Optional[jnp.ndarray] = None,  # [B, 3, 3]
) -> jnp.ndarray:
    """Pinhole projection (reference ``hmr_utils.py:14-52``). -> [B, N, 2]."""
    B = points.shape[0]
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points, precision=_P)
    points = points + translation[:, None, :]
    z = points[..., 2:3]
    projected = points[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    projected = projected * focal_length[:, None, :]
    if camera_center is not None:
        projected = projected + camera_center[:, None, :]
    return projected


def get_3d_parameters(
    smpl_inference,
    pred_smpl_betas: jnp.ndarray,  # [F, 10]
    pred_smpl_body_pose: jnp.ndarray,  # [F, 23, 3, 3]
    pred_smpl_global_orient: jnp.ndarray,  # [F, 1, 3, 3]
    pred_cam: jnp.ndarray,  # [F, 3] (s, tx, ty) crop camera
    center: jnp.ndarray,  # [F, 2] bbox center in source pixels
    size: jnp.ndarray,  # [F, 2] source image (h, w)
    scale: jnp.ndarray,  # [F, 1] bbox scale
) -> Dict[str, jnp.ndarray]:
    """Crop camera -> full-frame camera + projected 2D joints
    (reference ``hmr_utils.py:57-124``, from PHALP).

    Returns normalized 2D keypoints in [0, 1] crop units, the full-frame
    camera translation ``pred_cam_t``, and the normalized focal length.
    """
    F = pred_cam.shape[0]
    dtype = pred_cam.dtype

    img_h = size[:, 0:1]
    img_w = size[:, 1:2]
    new_size = jnp.max(size, axis=-1, keepdims=True)  # square-pad side
    top = (new_size - img_h) // 2
    left = (new_size - img_w) // 2
    ratio = 1.0 / jnp.round(new_size) * IMG_SIZE
    center_sq = (center + jnp.concatenate([left, top], axis=-1)) * ratio  # [F, 2]
    scale_sq = scale * new_size * ratio  # [F, 1]

    focal = jnp.full((F, 2), FOCAL_LENGTH, dtype)

    out = smpl_inference(
        pred_smpl_body_pose,
        pred_smpl_betas,
        pred_smpl_global_orient,
        jnp.zeros((F, 3), dtype),
    )
    pred_joints = out["joints"]  # [F, 45, 3]

    depth = 2.0 * focal[:, 0] / (pred_cam[:, 0] * scale_sq[:, 0] + 1e-9)
    cam_xy = pred_cam[:, 1:3] + (center_sq - IMG_SIZE / 2.0) * depth[:, None] / focal
    pred_cam_t = jnp.concatenate([cam_xy, depth[:, None]], axis=-1)  # [F, 3]

    camera_center = jnp.zeros((F, 2), dtype)
    kp2d = perspective_projection(
        pred_joints,
        translation=pred_cam_t,
        focal_length=focal / IMG_SIZE,
        camera_center=camera_center,
    )
    kp2d = (kp2d + 0.5) * IMG_SIZE

    return {
        "camera_center": camera_center,
        "focal_length": focal / IMG_SIZE,
        "pred_cam_t": pred_cam_t,
        "pred_joints": pred_joints,
        "pred_keypoints_2d_smpl": kp2d / IMG_SIZE,
        "rotation": jnp.broadcast_to(jnp.eye(3, dtype=dtype), (F, 3, 3)),
    }


def convert_hmr_pos_to_mocap_pos(pos: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z)_camera -> (x, z, -y)_mocap (reference ``hmr_utils.py:127-133``)."""
    return jnp.stack([pos[..., 0], pos[..., 2], -pos[..., 1]], axis=-1)


def convert_mocap_pos_to_hmr_pos(pos: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z)_mocap -> (x, -z, y)_camera (reference ``hmr_utils.py:136-142``)."""
    return jnp.stack([pos[..., 0], -pos[..., 2], pos[..., 1]], axis=-1)
