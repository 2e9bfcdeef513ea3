"""Loss library for the staged solver.

One function per loss key appearing in the YAML ``losses`` dicts
(``configs/video_mocap.yaml``); a term is active iff its key is present,
matching the reference's dispatch pattern (``optimization.py:87-117,
223-256, 353-374``, ``markers_utils.py:467-542``).  All terms are scalar,
jit/vmap/grad-safe, and batched over leading dims where meaningful.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import chamfer_by_part, masked_chamfer
from uuo_mocap_tpu.settings import MARKER_DISTANCE


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def full_chamfer_loss(markers, vertices, marker_weights, single_directional=True):
    """Weighted chamfer markers->vertices (reference ``optimization.py:96-103``)."""
    return masked_chamfer(markers, vertices, marker_weights, single_directional)


def part_chamfer_loss(markers, vertices, marker_labels_mode, vertex_labels, part_ids, single_directional):
    """Per-part chamfer (reference ``optimization.py:87-95`` via
    ``chamfer_distance_by_part``)."""
    return chamfer_by_part(
        markers, vertices, marker_labels_mode, vertex_labels, part_ids,
        marker_distance=MARKER_DISTANCE, single_directional=single_directional,
    )


def marker_loss(markers, virtual_markers, marker_weights, marker_distance=MARKER_DISTANCE):
    """((|m - v_hat| - d)^2 * w), averaged over ALL entries (the reference's
    ``MarkerLoss`` + ``torch.mean``, ``losses/losses.py:43-51``,
    ``optimization.py:354-362`` — note: mean over F*M, not over sum(w))."""
    d2 = jnp.sum((markers - virtual_markers) ** 2, axis=-1)
    dist = jnp.sqrt(d2 + 1e-18)  # NaN-grad-safe at exact overlap
    return jnp.mean(((dist - marker_distance) ** 2) * marker_weights)


def _vel_mask(frame_valid):
    """[F] validity -> [F-1] velocity-pair validity (both frames real)."""
    return frame_valid[1:] * frame_valid[:-1]


def _masked_mean(values, mask):
    """Mean of ``values`` over entries where mask>0; mask broadcasts from the
    leading (frame) axis.  Matches the reference's plain mean when every
    frame is real (mask all-ones)."""
    mask = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim)), values.shape)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1e-12)


def trans_vel_loss(trans, markers, frame_valid=None):
    """Match translation velocity to marker-centroid velocity
    (reference ``optimization.py:106-110``).  ``frame_valid`` [F] excludes
    bucket-padding frames (zeroed markers would otherwise create a huge
    spurious centroid-velocity target at the pad boundary)."""
    trans_vel = trans[1:] - trans[:-1]
    markers_mean = jnp.mean(markers, axis=1)
    markers_vel = markers_mean[1:] - markers_mean[:-1]
    if frame_valid is None:
        return mse(trans_vel, markers_vel)
    return _masked_mean((trans_vel - markers_vel) ** 2, _vel_mask(frame_valid))


def root_orient_vel_loss(z_root_orient, root_orient, frame_valid=None):
    """Match frame-to-frame root angular speed before/after the yaw offset
    (reference ``optimization.py:68-75,104-105``)."""
    vel_ref = rot.so3_relative_angle(root_orient[1:, 0], root_orient[:-1, 0])
    vel_new = rot.so3_relative_angle(z_root_orient[1:, 0], z_root_orient[:-1, 0])
    if frame_valid is None:
        return mse(vel_new, vel_ref)
    return _masked_mean((vel_new - vel_ref) ** 2, _vel_mask(frame_valid))


def ground_loss_joints(joints, frame_valid=None):
    """Penalize joints below the z=0 ground plane (reference
    ``optimization.py:115-117``)."""
    per = jax.nn.relu(-joints[..., 2])
    if frame_valid is None:
        return jnp.mean(per)
    return _masked_mean(per, frame_valid)


def ground_loss_vertices(vertices, frame_valid=None):
    """Vertex variant used by the part stage (``markers_utils.py:539-542``)."""
    per = jax.nn.relu(-vertices[..., 2])
    if frame_valid is None:
        return jnp.mean(per)
    return _masked_mean(per, frame_valid)


def foot_contact_loss(joints, foot_contacts, left_foot_id=10, right_foot_id=11, target_height=0.005):
    """Feet pinned near the ground on contact frames
    (reference ``markers_utils.py:519-522``)."""
    feet_z = joints[:, (left_foot_id, right_foot_id), 2]  # [F, 2]
    per = (feet_z - target_height) ** 2
    return jnp.mean(per * foot_contacts)


def foot_velocity_loss(joints, foot_contacts, left_foot_id=10, right_foot_id=11):
    """No foot skating on contact frames (reference ``markers_utils.py:525-530``)."""
    feet_xy = joints[:, (left_foot_id, right_foot_id), :2]  # [F, 2, 2]
    vel = feet_xy[1:] - feet_xy[:-1]
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1) + 1e-18)  # [F-1, 2]
    return jnp.mean((speed**2) * foot_contacts[1:])


def velocity_loss(trans, markers_subset_mean, frame_valid=None):
    """Part-stage translation/marker-centroid velocity match
    (reference ``markers_utils.py:533-536``)."""
    trans_vel = trans[1:] - trans[:-1]
    m_vel = markers_subset_mean[1:] - markers_subset_mean[:-1]
    if frame_valid is None:
        return mse(trans_vel, m_vel)
    return _masked_mean((trans_vel - m_vel) ** 2, _vel_mask(frame_valid))


def temporal_loss(pose_body, frame_valid=None):
    """Second-difference smoothness on pose (reference
    ``optimization.py:368-374``; note the reference's expression is
    t0 - 2*t1 - t2, reproduced verbatim)."""
    t0 = pose_body[2:]
    t1 = pose_body[1:-1]
    t2 = pose_body[0:-2]
    vel = t0 - (2 * t1) - t2
    if frame_valid is None:
        return jnp.mean(vel**2)
    triple = frame_valid[2:] * frame_valid[1:-1] * frame_valid[:-2]
    return _masked_mean(vel**2, triple)


def weighted_mse(input, target, weights):
    """(reference ``optimization.py:718-724``)."""
    return jnp.mean(((input - target) ** 2) * weights)


def soft_cross_entropy(logits, target_probs):
    """KL-divergence against soft targets (reference ``SoftCrossEntropyLoss``,
    ``losses/losses.py:6-12``): batchmean KLDiv(log_softmax(logits), target)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = jnp.where(target_probs > 0, target_probs * (jnp.log(jnp.maximum(target_probs, 1e-12)) - logp), 0.0)
    return jnp.sum(per) / logits.shape[0]


def line_segment_loss(points, markers, reduction: str = "mean"):
    """Distance of markers to the infinite line through a segment
    (reference ``LineSegmentLoss``, ``losses/losses.py:15-40``).

    points [F, 2, 3] segment endpoints, markers [F, M, 3].
    """
    line = points[:, 0:1] - points[:, 1:2]  # [F, 1, 3]
    line_m = markers - points[:, 1:2]  # [F, M, 3]
    norm_line = jnp.linalg.norm(line, axis=-1)  # [F, 1]
    cross = jnp.cross(jnp.broadcast_to(line, line_m.shape), line_m)
    norm_cross = jnp.linalg.norm(cross, axis=-1)  # [F, M]
    vals = norm_cross / jnp.maximum(norm_line, 1e-12)
    return jnp.mean(vals) if reduction == "mean" else jnp.sum(vals)
