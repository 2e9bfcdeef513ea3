"""Marker <-> vertex distance kernels.

TPU-native replacement for PyTorch3D's CUDA kNN ``chamfer_distance``
(reference ``losses/chamfer_distance.py:5-21``, ``optimization.py:7``,
``markers_utils.py:9``, ``hmr_utils.py:5``) and for the host-side per-frame
``compute_nearest_points`` distance loop (``optimization.py:470-603``) —
here a single device program.

Semantics match PyTorch3D (used by the reference everywhere):
  * distances are *squared* Euclidean;
  * weighted mean  =  sum(w_i * d_i) / sum(w_i)   (its batched weights path);
  * ``single_directional`` means markers -> vertices only.

All kernels broadcast over leading batch dims and use highest-precision
matmuls for the cross term (bf16 MXU default loses ~1e-2 relative, enough to
flip nearest-vertex assignments).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST

# Frame-axis chunk for scanned reductions.  A full [F, M, V] (or worse,
# [lanes, F, M, V] under vmap) distance tensor OOMs HBM at the canonical
# 450-frame x 6890-vertex workload; scanning frame chunks keeps the live set
# at [lanes, CHUNK, M, V] while the MXU still sees well-shaped matmuls.
DEFAULT_FRAME_CHUNK = 32


def _scan_frame_chunks(step_fn, arrays, num_frames: int, chunk: int):
    """Split the leading frame axis into chunks and lax.scan ``step_fn`` over
    them.  ``step_fn(chunked_arrays) -> per-frame outputs`` (leading axis =
    chunk).  Frames are zero-padded to a multiple of ``chunk``; callers mask
    the tail via their weight arguments.  Returns outputs with leading axis
    ``num_frames``."""
    pad = (-num_frames) % chunk
    K = (num_frames + pad) // chunk

    def pad_reshape(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((K, chunk) + a.shape[1:])

    xs = jax.tree_util.tree_map(pad_reshape, arrays)

    def body(carry, chunk_arrays):
        return carry, step_fn(chunk_arrays)

    _, out = jax.lax.scan(body, None, xs)
    out = jax.tree_util.tree_map(lambda o: o.reshape((K * chunk,) + o.shape[2:])[:num_frames], out)
    return out


def squared_distance_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances [..., M, 3] x [..., V, 3] -> [..., M, V].

    Uses the |x|^2 - 2xy + |y|^2 expansion: one [M,3]x[3,V] contraction that
    XLA fuses with the rank-1 terms; clamped at 0 against cancellation.
    """
    # Center both clouds about the y centroid: the expansion's cancellation
    # error scales with |x||y|, so removing the common offset keeps the f32
    # noise floor ~1e-7 m^2 even when the subject is meters from the origin.
    c = jnp.mean(y, axis=-2, keepdims=True)
    x = x - c
    y = y - c
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]  # [..., M, 1]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]  # [..., 1, V]
    xy = jnp.einsum("...md,...vd->...mv", x, y, precision=_P)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def nearest_vertex(x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """min_v ||x_m - y_v||^2 and argmin over V: -> ([..., M], [..., M])."""
    d2 = squared_distance_matrix(x, y)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1)


def _min_over_rows(x: jnp.ndarray, y: jnp.ndarray, chunk: Optional[int]) -> jnp.ndarray:
    """min_v d^2(x, y) [..., M]; frame-chunk-scanned for [F, M, 3] inputs."""
    if chunk is None or x.ndim != 3 or x.shape[0] <= chunk:
        return jnp.min(squared_distance_matrix(x, y), axis=-1)

    def step(arrs):
        x_c, y_c = arrs
        return jnp.min(squared_distance_matrix(x_c, y_c), axis=-1)

    return _scan_frame_chunks(step, (x, y), x.shape[0], chunk)


def masked_chamfer(
    x: jnp.ndarray,  # [..., M, 3] markers
    y: jnp.ndarray,  # [..., V, 3] vertices
    x_weights: Optional[jnp.ndarray] = None,  # [..., M]
    single_directional: bool = True,
    frame_chunk: Optional[int] = DEFAULT_FRAME_CHUNK,
) -> jnp.ndarray:
    """Weighted (single-directional by default) chamfer scalar.

    Equals the reference's ``weighted_chamfer_distance``
    (``losses/chamfer_distance.py:5-21``): each marker is its own pytorch3d
    "batch element" with its own weight, so the result is
    sum(w * min_v d^2) / sum(w) over every (frame, marker).
    """
    if x_weights is None:
        x_weights = jnp.ones(x.shape[:-1], x.dtype)
    d2_x = _min_over_rows(x, y, frame_chunk)  # [..., M]
    w = x_weights.astype(x.dtype)
    loss = jnp.sum(d2_x * w) / jnp.maximum(jnp.sum(w), 1e-12)
    if single_directional:
        return loss
    d2_y = _min_over_rows(y, x, frame_chunk)
    # pytorch3d unweighted bidirectional: mean over batch of per-cloud means
    loss_y = jnp.mean(d2_y)
    return loss + loss_y


def chamfer_bidirectional(x: jnp.ndarray, y: jnp.ndarray,
                          frame_chunk: Optional[int] = DEFAULT_FRAME_CHUNK) -> jnp.ndarray:
    """Unweighted bidirectional chamfer, pytorch3d reduction (mean of each
    direction's per-point mean, summed) — the part-fit scoring metric
    (reference ``markers_utils.py:575-580``)."""
    d2_x = _min_over_rows(x, y, frame_chunk)
    d2_y = _min_over_rows(y, x, frame_chunk)
    return jnp.mean(d2_x) + jnp.mean(d2_y)


def masked_chamfer_vertex_subset(
    x: jnp.ndarray,  # [..., M, 3]
    y: jnp.ndarray,  # [..., V, 3]
    x_mask: jnp.ndarray,  # [..., M] bool/float — marker validity
    y_mask: jnp.ndarray,  # [V] or [..., V] bool/float — vertex subset (padded)
    single_directional: bool = True,
    frame_chunk: Optional[int] = DEFAULT_FRAME_CHUNK,
) -> jnp.ndarray:
    """Chamfer against a *masked vertex subset* — the vmapped replacement for
    the reference's per-subtree ``vertices[:, vertex_indices]`` gather
    (``markers_utils.py:469-475``): invalid vertices are pushed to +inf
    instead of gathered, so every subtree in a padded batch shares one shape.
    """
    big = jnp.asarray(1e10, x.dtype)
    V = y.shape[-2]
    M = x.shape[-2]
    chunked = frame_chunk is not None and x.ndim == 3 and x.shape[0] > frame_chunk
    ym_flat = jnp.broadcast_to(y_mask, y.shape[:-1])  # [..., V]
    xm = x_mask.astype(x.dtype)

    if not chunked:
        d2 = squared_distance_matrix(x, y)  # [..., M, V]
        d2_x = jnp.min(jnp.where(ym_flat[..., None, :] > 0, d2, big), axis=-1)
        loss = jnp.sum(d2_x * xm) / jnp.maximum(jnp.sum(xm), 1e-12)
        if single_directional:
            return loss
        d2_y = jnp.min(jnp.where(x_mask[..., None, :] > 0, jnp.swapaxes(d2, -1, -2), big), axis=-1)
        wy = ym_flat.astype(x.dtype)
        return loss + jnp.sum(d2_y * wy) / jnp.maximum(jnp.sum(wy), 1e-12)

    F = x.shape[0]
    ym_f = jnp.broadcast_to(ym_flat, (F, V)) if ym_flat.ndim == 1 else ym_flat

    def step(arrs):
        x_c, y_c, ym_c, xm_c = arrs
        d2 = squared_distance_matrix(x_c, y_c)  # [C, M, V]
        d2_x = jnp.min(jnp.where(ym_c[:, None, :] > 0, d2, big), axis=-1)  # [C, M]
        if single_directional:
            return d2_x, jnp.zeros_like(ym_c)
        d2_y = jnp.min(jnp.where(xm_c[:, None, :] > 0, jnp.swapaxes(d2, -1, -2), big), axis=-1)
        return d2_x, d2_y

    d2_x, d2_y = _scan_frame_chunks(step, (x, y, ym_f, xm), F, frame_chunk)
    loss = jnp.sum(d2_x * xm) / jnp.maximum(jnp.sum(xm), 1e-12)
    if single_directional:
        return loss
    wy = ym_f.astype(x.dtype)
    return loss + jnp.sum(d2_y * wy) / jnp.maximum(jnp.sum(wy), 1e-12)


def chamfer_by_part(
    markers: jnp.ndarray,  # [F, M, 3]
    vertices: jnp.ndarray,  # [F, V, 3]
    marker_labels_mode: jnp.ndarray,  # [M] per-marker part id (mode over frames)
    vertex_labels: jnp.ndarray,  # [V] argmax-LBS part id
    part_ids: jnp.ndarray,  # [P] the part ids present (padded with -1)
    marker_distance: float,
    single_directional: bool = False,
) -> jnp.ndarray:
    """Per-part chamfer sum: for each part, bidirectional chamfer between the
    part's vertices and its markers, scored as (chamfer - marker_distance)^2
    and summed (reference ``chamfer_distance_by_part``,
    ``optimization.py:682-700``).  Parts are masked, not gathered, so the
    whole sum is one fixed-shape program vmapped over ``part_ids``.

    NOTE: the reference calls pytorch3d with (vertices_part, markers_part),
    i.e. the *single-directional* direction is vertices -> markers.
    """

    def per_part(pid):
        vmask = (vertex_labels == pid).astype(markers.dtype)  # [V]
        mmask = (marker_labels_mode == pid).astype(markers.dtype)  # [M]
        valid = (pid >= 0) & (jnp.sum(vmask) > 0) & (jnp.sum(mmask) > 0)
        cham = masked_chamfer_vertex_subset(
            vertices,
            markers,
            x_mask=jnp.broadcast_to(vmask, vertices.shape[:-1]),
            y_mask=jnp.broadcast_to(mmask[None], markers.shape[:-1]),
            single_directional=single_directional,
        )
        return jnp.where(valid, (cham - marker_distance) ** 2, 0.0)

    return jnp.sum(jax.vmap(per_part)(part_ids))


def mean_nearest_vertex_over_frames(
    markers: jnp.ndarray,  # [F, M, 3]
    vertices: jnp.ndarray,  # [F, V, 3]
    frame_mask: jnp.ndarray,  # [F] 1 = frame participates (img_mask)
) -> jnp.ndarray:
    """argmin_v of mean_f ||marker_mf - vertex_vf|| over masked frames.

    One device program replacing the reference's per-frame host loop +
    [F, M, V] numpy matrix (``optimization.py:479-486, 595-603`` — the
    ``use_mean`` path of ``compute_nearest_points``).  The [M, V] accumulator
    lives on-chip; frames stream through a scan, so memory is O(M*V), not
    O(F*M*V).

    Returns vertex indices [M].
    """
    F = markers.shape[0]
    M = markers.shape[1]
    V = vertices.shape[1]
    acc0 = jnp.zeros((M, V), markers.dtype)

    def body(acc, inp):
        m_f, v_f, w_f = inp
        d = jnp.sqrt(squared_distance_matrix(m_f, v_f) + 1e-18)  # [M, V] (norms, like the reference)
        return acc + d * w_f, None

    w = frame_mask.astype(markers.dtype)
    acc, _ = jax.lax.scan(body, acc0, (markers, vertices, w))
    mean_d = acc / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.argmin(mean_d, axis=-1)  # [M]
