"""Pure-JAX 3D rotation library.

TPU-native replacement for the rotation machinery the reference pulls from
``pytorch3d.transforms`` and ``roma`` (see reference
``src/video_mocap/optimization.py:8``, ``src/video_mocap/multimodal.py:5``,
``src/video_mocap/img_smpl/img_smpl.py:4-6``).  All functions are
shape-polymorphic over leading batch dimensions, jit/vmap/grad-safe, and use
closed forms with small-angle Taylor guards (no data-dependent branching).

Conventions (matching pytorch3d):
  * quaternions are (w, x, y, z), real part first, unit norm
  * rotation matrices act on column vectors: ``v' = R @ v``
  * the 6d representation is the first two *rows* of the matrix
    (``matrix_to_rotation_6d``); ``rotation_6d_to_matrix`` Gram-Schmidts them
    back into an orthonormal frame (Zhou et al. 2019).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with a Taylor guard at 0."""
    small = jnp.abs(x) < 1e-4
    x_safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(x_safe) / x_safe)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. [..., 3] -> [..., 3, 3].

    Mirrors ``pytorch3d.transforms.axis_angle_to_matrix``
    (used at reference ``optimization.py:662-679``).
    """
    # Closed form R = cos(t) I + sinc(t) hat(aa) + (1-cos t)/t^2 aa aa^T —
    # elementwise (no 3x3 matmul), so TPU default-precision bf16 MXU paths
    # never touch it, and the t -> 0 limit is exact.
    #
    # Gradient safety: sqrt(theta2) has an infinite derivative at 0 and
    # ``where`` does NOT block NaN grads from the untaken branch, so theta2
    # is replaced by 1.0 *before* the sqrt in the small-angle region and all
    # small-branch terms are polynomials in theta2 (exact grads at 0).
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)  # [..., 1]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    cos_t = jnp.where(small, 1.0 - theta2 / 2.0, jnp.cos(theta))[..., None]
    sinc_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)[..., None]
    one_minus_cos_over_t2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe
    )[..., None]
    aax, aay, aaz = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zero = jnp.zeros_like(aax)
    A = jnp.stack(
        [
            jnp.stack([zero, -aaz, aay], axis=-1),
            jnp.stack([aaz, zero, -aax], axis=-1),
            jnp.stack([-aay, aax, zero], axis=-1),
        ],
        axis=-2,
    )  # hat(aa), [..., 3, 3]
    outer = axis_angle[..., :, None] * axis_angle[..., None, :]  # aa aa^T
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    return cos_t * eye + sinc_t * A + one_minus_cos_over_t2 * outer


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z), branch-free Shepperd variant."""
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate quaternions, one per dominant component.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw = safe_sqrt(1.0 + m00 + m11 + m22)
    qx = safe_sqrt(1.0 + m00 - m11 - m22)
    qy = safe_sqrt(1.0 - m00 + m11 - m22)
    qz = safe_sqrt(1.0 - m00 - m11 + m22)

    cand_w = jnp.stack([qw * qw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * qw[..., None])
    cand_x = jnp.stack([m21 - m12, qx * qx, m01 + m10, m02 + m20], axis=-1) / (2.0 * qx[..., None])
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy * qy, m12 + m21], axis=-1) / (2.0 * qy[..., None])
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz * qz], axis=-1) / (2.0 * qz[..., None])

    trace_based = jnp.stack(
        [1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(trace_based, axis=-1)  # [...]
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4 cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonical sign: non-negative real part (pytorch3d convention).
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    # Same NaN-grad-safe pattern as axis_angle_to_matrix.
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    sinc_half = jnp.where(small, 1.0 - theta2 / 24.0, jnp.sin(half) / half)
    xyz = axis_angle * 0.5 * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    q = quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)
    n2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    small = n2 < 1e-12
    n2_safe = jnp.where(small, 1.0, n2)  # NaN-grad-safe sqrt (see axis_angle_to_matrix)
    norm_xyz = jnp.sqrt(n2_safe)
    half = jnp.arctan2(norm_xyz, q[..., :1])
    # axis_angle = xyz * 2*half/|xyz|; as |xyz| -> 0, 2*half/|xyz| -> 2/w -> 2
    scale = jnp.where(small, 2.0, 2.0 * half / norm_xyz)
    return q[..., 1:] * scale


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """First two rows, flattened: [..., 3, 3] -> [..., 6] (pytorch3d layout)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt two 3-vectors into orthonormal rows: [..., 6] -> [..., 3, 3]."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def normalize_rotation(matrix: jnp.ndarray) -> jnp.ndarray:
    """``rotation_6d_to_matrix(matrix_to_rotation_6d(x))`` — the reference's
    ``normalize_rot`` (``multimodal.py:34-35``)."""
    return rotation_6d_to_matrix(matrix_to_rotation_6d(matrix))


def _acos_linear_extrapolation(x: jnp.ndarray, bound: float = 1.0 - 1e-4) -> jnp.ndarray:
    """acos with linear extrapolation outside [-bound, bound] for stable grads
    (mirrors pytorch3d's ``acos_linear_extrapolation`` used by
    ``so3_relative_angle``)."""
    x_clamped = jnp.clip(x, -bound, bound)
    acos_val = jnp.arccos(x_clamped)
    dacos = -1.0 / jnp.sqrt(1.0 - bound * bound)
    upper = jnp.arccos(bound) + dacos * (x - bound)
    lower = jnp.arccos(-bound) + dacos * (x + bound)
    return jnp.where(x > bound, upper, jnp.where(x < -bound, lower, acos_val))


def so3_rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of [..., 3, 3] in radians.

    Uses atan2(|skew(R)|, trace) which is accurate over the whole range
    (plain acos((tr-1)/2) loses ~1e-2 rad near 0 and pi in float32).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    sx = R[..., 2, 1] - R[..., 1, 2]
    sy = R[..., 0, 2] - R[..., 2, 0]
    sz = R[..., 1, 0] - R[..., 0, 1]
    sin_term = 0.5 * jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, _EPS * _EPS))
    cos_term = 0.5 * (trace - 1.0)
    return jnp.arctan2(sin_term, cos_term)


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle of R1 @ R2^T — pytorch3d ``so3_relative_angle``
    (reference ``optimization.py:68-75``)."""
    R12 = jnp.einsum("...ij,...kj->...ik", R1, R2, precision=jax.lax.Precision.HIGHEST)
    return so3_rotation_angle(R12)


def quaternion_slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Spherical linear interpolation of unit quaternions.

    Replaces ``roma.utils.unitquat_slerp`` (reference ``multimodal.py:168-169``,
    ``img_smpl.py:84-98``).  Takes the shortest arc; falls back to lerp when
    the quaternions are nearly parallel.  ``alpha`` broadcasts over leading dims.
    """
    alpha = jnp.asarray(alpha)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot_c, 0.0, 1.0 - _EPS))
    sin_theta = jnp.sin(theta)
    near = dot_c > 1.0 - 1e-6
    w0 = jnp.where(near, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, alpha, jnp.sin(alpha * theta) / jnp.where(near, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def matrix_slerp(R0: jnp.ndarray, R1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Slerp directly on rotation matrices (HMR stream resampling,
    reference ``multimodal.py:161-172``)."""
    return quaternion_to_matrix(quaternion_slerp(matrix_to_quaternion(R0), matrix_to_quaternion(R1), alpha))


def rot_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Yaw rotation about +z from [..., 1] angle — the reference's
    ``compute_root_orient_z`` (``optimization.py:672-679``)."""
    zeros = jnp.zeros_like(angle)
    aa = jnp.concatenate([zeros, zeros, angle], axis=-1)
    return axis_angle_to_matrix(aa)


def rot_y(angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +y from [..., 1] angle — ``compute_root_orient_y``
    (``optimization.py:662-669``)."""
    zeros = jnp.zeros_like(angle)
    aa = jnp.concatenate([zeros, angle, zeros], axis=-1)
    return axis_angle_to_matrix(aa)


def apply_rotation(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """R @ v for [..., 3, 3] x [..., 3] — ``apply_matrix_33_to_vector_3``
    (reference ``hmr_utils.py:160-167``) without the 4x4 padding detour."""
    return jnp.einsum("...ij,...j->...i", mat, vec)
