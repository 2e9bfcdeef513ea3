"""Evaluation metric suite.

JAX re-implementation of the reference's ``evaluation/metrics.py``:
m2s (marker-to-surface, via the closed-form point-triangle kernel instead
of libigl), MPJPE / PA-MPJPE (Procrustes), MPJVE / PA-MPJVE (velocity at
sequence rate), V2V, and per-joint-subset variants.  All metrics are in the
model's native units (meters); callers scale to millimeters as the
reference's comparison harness does (``comparisons.py:20-26, 80``).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.joints import SMPL_LIMBS
from uuo_mocap_tpu.ops.point_mesh import marker_to_surface_distance
from uuo_mocap_tpu.ops.procrustes import similarity_transform

# joint subsets for per-part metrics (reference ``comparisons.py:28-44``)
PARTS_MAP: Dict[str, List[int]] = {
    "full": list(range(22)),
    **{name: joints for name, joints in SMPL_LIMBS.items()},
}


def compute_m2s(markers: jnp.ndarray, vertices: jnp.ndarray, faces) -> jnp.ndarray:
    """Mean |marker -> surface| distance (reference ``metrics.py:27-45``)."""
    return marker_to_surface_distance(markers, vertices, jnp.asarray(faces))


def compute_mpjpe(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray,
                  joint_ids: Sequence[int] | None = None) -> jnp.ndarray:
    """(reference ``metrics.py:48-62``)."""
    if joint_ids is not None:
        pred_joints = pred_joints[:, jnp.asarray(joint_ids)]
        gt_joints = gt_joints[:, jnp.asarray(joint_ids)]
    return jnp.mean(jnp.linalg.norm(pred_joints - gt_joints, axis=-1))


def compute_mpjve(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray, freq: float,
                  joint_ids: Sequence[int] | None = None) -> jnp.ndarray:
    """(reference ``metrics.py:65-85``)."""
    pred_vel = (pred_joints[1:] - pred_joints[:-1]) * freq
    gt_vel = (gt_joints[1:] - gt_joints[:-1]) * freq
    if joint_ids is not None:
        pred_vel = pred_vel[:, jnp.asarray(joint_ids)]
        gt_vel = gt_vel[:, jnp.asarray(joint_ids)]
    return jnp.mean(jnp.linalg.norm(pred_vel - gt_vel, axis=-1))


def compute_pa_mpjpe(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray,
                     joint_ids: Sequence[int] | None = None) -> jnp.ndarray:
    """Procrustes-aligned MPJPE (reference ``metrics.py:88-104``)."""
    pred_hat = similarity_transform(pred_joints, gt_joints)
    return compute_mpjpe(pred_hat, gt_joints, joint_ids)


def compute_pa_mpjve(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray, freq: float,
                     joint_ids: Sequence[int] | None = None) -> jnp.ndarray:
    """(reference ``metrics.py:107-129``)."""
    pred_hat = similarity_transform(pred_joints, gt_joints)
    return compute_mpjve(pred_hat, gt_joints, freq, joint_ids)


def compute_v2v(pred_vertices: jnp.ndarray, gt_vertices: jnp.ndarray) -> jnp.ndarray:
    """(reference ``metrics.py:132-137``)."""
    return jnp.mean(jnp.linalg.norm(pred_vertices - gt_vertices, axis=-1))


def compute_all_metrics(
    pred_joints: jnp.ndarray,  # [F, >=22, 3]
    gt_joints: jnp.ndarray,
    pred_vertices: jnp.ndarray,  # [F, V, 3]
    gt_vertices: jnp.ndarray,
    markers: jnp.ndarray,  # [F, M, 3]
    faces,
    freq: float,
    in_mm: bool = True,
) -> Dict[str, float]:
    """Full metric dict for one sequence (the reference's
    ``compute_metrics_full``, ``comparisons.py:102-158``): joints restricted
    to the first 22 (hands excluded for fairness)."""
    scale = 1000.0 if in_mm else 1.0
    pj = pred_joints[:, :22]
    gj = gt_joints[:, :22]
    out = {
        "m2s": float(compute_m2s(markers, pred_vertices, faces)) * scale,
        "mpjpe": float(compute_mpjpe(pj, gj)) * scale,
        "pa_mpjpe": float(compute_pa_mpjpe(pj, gj)) * scale,
        "mpjve": float(compute_mpjve(pj, gj, freq)) * scale,
        "pa_mpjve": float(compute_pa_mpjve(pj, gj, freq)) * scale,
        "v2v": float(compute_v2v(pred_vertices, gt_vertices)) * scale,
    }
    return out


def compute_part_metrics(
    pred_joints: jnp.ndarray, gt_joints: jnp.ndarray, freq: float, in_mm: bool = True
) -> Dict[str, Dict[str, float]]:
    """Per-part MPJPE/PA-MPJPE/MPJVE (reference ``comparisons.py:60-99``)."""
    scale = 1000.0 if in_mm else 1.0
    out = {}
    for part, ids in PARTS_MAP.items():
        out[part] = {
            "mpjpe": float(compute_mpjpe(pred_joints, gt_joints, ids)) * scale,
            "pa_mpjpe": float(compute_pa_mpjpe(pred_joints[:, :22], gt_joints[:, :22], [i for i in ids if i < 22])) * scale,
            "mpjve": float(compute_mpjve(pred_joints, gt_joints, freq, ids)) * scale,
        }
    return out
