"""Small geometry utilities: AABB, marker masks, geometric median, closest
point — JAX ports of the reference's ``utils/aabb.py``, ``utils/points.py``
and ``get_marker_mask`` (``optimization.py:703-715``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def get_aabb(points: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] -> [..., 2, 3] (min, max) — reference ``utils/aabb.py:5-17``."""
    return jnp.stack([jnp.min(points, axis=-2), jnp.max(points, axis=-2)], axis=-2)


def get_aabb_volume(aabb: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, 3] -> [...] volume — reference ``utils/aabb.py:20-25``."""
    ext = aabb[..., 1, :] - aabb[..., 0, :]
    return jnp.prod(ext, axis=-1)


def get_marker_mask(markers: jnp.ndarray) -> jnp.ndarray:
    """1 where the marker is valid (not exactly at the origin) — occluded
    markers are zero-filled upstream (reference ``optimization.py:703-715``).
    [..., M, 3] -> [..., M] float."""
    return (jnp.sum(jnp.abs(markers), axis=-1) != 0.0).astype(markers.dtype)


def closest_point(points: jnp.ndarray, cloud: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Brute-force nearest neighbor point->cloud
    (reference ``utils/points.py:19-42``)."""
    from uuo_mocap_tpu.ops.chamfer import squared_distance_matrix

    d2 = squared_distance_matrix(points, cloud)
    idx = jnp.argmin(d2, axis=-1)
    return {
        "vertex_indices": idx,
        "distances": jnp.sqrt(jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]),
        "points": cloud[..., idx, :] if cloud.ndim == 2 else jnp.take_along_axis(cloud, idx[..., None], axis=-2),
    }


def geometric_median(points: jnp.ndarray, iters: int = 32) -> jnp.ndarray:
    """Weiszfeld iteration [..., N, 3] -> [..., 3]
    (reference ``utils/points.py:6-16`` uses scipy minimize; same objective)."""

    def body(_, y):
        d = jnp.linalg.norm(points - y[..., None, :], axis=-1)  # [..., N]
        w = 1.0 / jnp.maximum(d, 1e-8)
        return jnp.sum(points * w[..., None], axis=-2) / jnp.sum(w, axis=-1, keepdims=True)

    y0 = jnp.mean(points, axis=-2)
    return jax.lax.fori_loop(0, iters, body, y0)


def vertex_normals(vertices, faces) -> jnp.ndarray:
    """Area-weighted vertex normals [..., V, 3] (replaces trimesh
    ``vertex_normals`` used by the synthetic marker generators,
    reference ``utils/marker_layout.py:68-73``).

    Host-side numpy: this feeds data *generation*, not the solve path, and
    the scatter-add form compiles pathologically on TPU (tiny minor dims +
    serialized scatters).
    """
    import numpy as np

    v = np.asarray(vertices)
    f = np.asarray(faces)
    t0, t1, t2 = v[..., f[:, 0], :], v[..., f[:, 1], :], v[..., f[:, 2], :]
    fn = np.cross(t1 - t0, t2 - t0)  # area-weighted face normals [..., T, 3]
    vn = np.zeros(v.shape, v.dtype)
    flat_vn = vn.reshape(-1, v.shape[-2], 3)
    flat_fn = fn.reshape(-1, f.shape[0], 3)
    for b in range(flat_vn.shape[0]):
        for k in range(3):
            np.add.at(flat_vn[b], f[:, k], flat_fn[b])
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return jnp.asarray(vn / np.maximum(norm, 1e-12))


def upsample_frames(x: jnp.ndarray, F_full: int, stride: int) -> jnp.ndarray:
    """Linear-interp a frame-strided lane tensor [Ln, F_s, ...] (sampled at
    frames 0, s, 2s, ...) back to [Ln, F_full, ...] — the warm-start
    resampling for the frame-strided tournament rounds (coarse-to-fine,
    Benchmarks.md round 5)."""
    Fs = x.shape[1]
    pos = jnp.arange(F_full, dtype=jnp.float32) / float(stride)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, Fs - 1)
    i1 = jnp.clip(i0 + 1, 0, Fs - 1)
    w = (pos - i0.astype(jnp.float32)).reshape((1, F_full) + (1,) * (x.ndim - 2))
    return x[:, i0] * (1.0 - w) + x[:, i1] * w
