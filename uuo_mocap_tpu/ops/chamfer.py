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

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_P = jax.lax.Precision.HIGHEST

# Frame-axis chunk for scanned reductions.  None (default): XLA fuses the
# subtract-square-min pipeline and never materializes [.., M, V] (measured
# ~0.1 ms fwd+bwd at the canonical 4x450x41x6890 workload; a chunked scan
# BLOCKS that fusion and costs ~17 ms/eval).  Set a chunk size only for
# shapes where fusion provably fails and HBM overflows.
DEFAULT_FRAME_CHUNK = None


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


def squared_distance_matrix(x: jnp.ndarray, y: jnp.ndarray, precision=_P,
                            compute_dtype=None) -> jnp.ndarray:
    """Pairwise squared distances [..., M, 3] x [..., V, 3] -> [..., M, V].

    Uses the |x|^2 - 2xy + |y|^2 expansion: one [M,3]x[3,V] contraction that
    XLA fuses with the rank-1 terms; clamped at 0 against cancellation.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) quantizes AFTER the f32
    centering — centered coordinates span ~1 m where bf16 resolves ~4 mm,
    vs ~3 cm at a multi-meter world offset.  Only rank-only callers should
    pass it (the returned distances carry bf16 noise ~1e-3 m^2).
    """
    # Center both clouds about the y centroid: the expansion's cancellation
    # error scales with |x||y|, so removing the common offset keeps the f32
    # noise floor ~1e-7 m^2 even when the subject is meters from the origin.
    c = jnp.mean(y, axis=-2, keepdims=True)
    x = x - c
    y = y - c
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        y = y.astype(compute_dtype)
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]  # [..., M, 1]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]  # [..., 1, V]
    xy = jnp.einsum("...md,...vd->...mv", x, y, precision=precision)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def nearest_vertex(x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """min_v ||x_m - y_v||^2 and argmin over V: -> ([..., M], [..., M])."""
    d2 = squared_distance_matrix(x, y)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def min_sqdist(x: jnp.ndarray, y: jnp.ndarray, y_bias: jnp.ndarray) -> jnp.ndarray:
    """min over V of d^2(x, y) + y_bias:  [..., M, 3] x [..., V, 3] x [..., V]
    -> [..., M].  ``y_bias`` masks vertices out (0 = keep, big = exclude).

    Custom VJP: the native backward of min-over-V materializes the full
    [..., M, V] equality mask (~2 GB at the canonical 4x450x41x6890 shape,
    measured +34 ms/eval); here the backward is an argmin gather plus an
    [..., M]-sized scatter-add — O(M), not O(M*V).
    """
    d2 = squared_distance_matrix(x, y) + y_bias[..., None, :]
    return jnp.min(d2, axis=-1)


# Pallas TPU kernels for the hot path: fused single-pass (min, argmin)
# forward and a scatter-free one-hot-matmul backward.  Both fall back to
# XLA off-TPU or when M exceeds the kernel lane width (the y->x direction
# of bidirectional chamfer has M = V = 6890).
from uuo_mocap_tpu.ops.chamfer_pallas import (  # noqa: E402
    M_PAD as _PALLAS_M_PAD,
    make_min_grad_y,
    min_sqdist_pallas,
    pallas_available,
)

# MEASURED COUNTER-RESULT (canonical 4x450x41x6890 closure fwd+bwd on the
# v5e): Pallas fwd 8.4 ms (== XLA's fused pass), Pallas one-hot-matmul bwd
# SLOWER than the XLA scatter (grad x,y,bias 28.5 vs 23.0 ms; full closure
# 56.8 vs 33.6 ms) — the B=1800 tiny grid programs are launch-bound.  The
# kernels stay as an opt-in (UUO_CHAMFER_PALLAS=1) and the default hot path
# avoids the dense backward entirely via the sparse-gradient LBS gather
# (pipeline/stages.py), which makes the scatter moot.
_PALLAS = pallas_available() and os.environ.get("UUO_CHAMFER_PALLAS", "0") == "1"
_dy_kernels = {}


def _dy_kernel(V: int):
    if V not in _dy_kernels:
        _dy_kernels[V] = make_min_grad_y(V)
    return _dy_kernels[V]


def _min_sqdist_fwd(x, y, y_bias):
    if _PALLAS and x.shape[-2] <= _PALLAS_M_PAD:
        # one pass over the vertex cloud; no [M, V] product materializes
        val, idx = min_sqdist_pallas(x, y, jnp.broadcast_to(y_bias, y.shape[:-1]))
        return val, (x, y, idx)
    d2 = squared_distance_matrix(x, y) + y_bias[..., None, :]
    idx = jnp.argmin(d2, axis=-1)  # [..., M]
    # two fused reductions over the same producer: XLA recomputes d2 per
    # reduction without materializing it (take_along_axis would force the
    # full [..., M, V] tensor into HBM — ~5 GB at the canonical shape)
    val = jnp.min(d2, axis=-1)
    return val, (x, y, idx)


def _min_sqdist_bwd(res, g):
    x, y, idx = res
    batch_shape = x.shape[:-2]
    M = x.shape[-2]
    V = y.shape[-2]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    x_f = x.reshape(B, M, 3)
    y_f = y.reshape(B, V, 3)
    idx_f = idx.reshape(B, M)
    g_f = g.reshape(B, M)

    y_near = jnp.take_along_axis(y_f, idx_f[..., None], axis=-2)  # [B, M, 3]
    diff = 2.0 * (x_f - y_near) * g_f[..., None]  # d d2/dx
    dx = diff.reshape(x.shape)

    if _PALLAS and M <= _PALLAS_M_PAD:
        dy, dbias = _dy_kernel(V)(idx, diff.reshape(batch_shape + (M, 3)), g)
        return dx, dy.reshape(y.shape), dbias.reshape(y.shape[:-1])

    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
    dy = jnp.zeros_like(y_f).at[rows, idx_f].add(-diff)
    # bias grad: sum of g at each selected vertex
    dbias = jnp.zeros((B, V), g.dtype).at[rows, idx_f].add(g_f)
    return dx, dy.reshape(y.shape), dbias.reshape(y.shape[:-1])


min_sqdist.defvjp(_min_sqdist_fwd, _min_sqdist_bwd)


# ---- two-stage (bf16 candidate -> f32 refine) variant ----------------------
# The f32 [.., M, V] distance product is pure HBM traffic (V=6890 never fits
# a useful reuse pattern), and min+argmin recompute it twice.  Stage 1 ranks
# vertices with a bf16 MXU matmul (half the bytes, 8x the MACs/cycle); stage
# 2 computes the EXACT f32 distance only at the selected vertex (O(M)).  The
# returned value/gradient are exact at the chosen vertex; only the argmin
# selection is bf16-ranked, which can flip between near-equidistant vertices
# (value error at a flip is the distance gap itself, sub-1e-3 m^2).
# MEASURED (canonical 4x450x41x6890 closure fwd+bwd): 33.4 -> 28.4 ms — the
# d2 product is NOT the bottleneck (the backward scatter is; see the Pallas
# kernels above), so this stays an opt-in alternative, not the default.

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def min_sqdist_2stage(x: jnp.ndarray, y: jnp.ndarray, y_bias: jnp.ndarray) -> jnp.ndarray:
    # primal == fwd (bf16-ranked pick, exact f32 refine) so the loss VALUE is
    # identical in grad contexts (L-BFGS line search) and no-grad contexts
    # (hypothesis scoring) — an exact-dense primal here could flip hypothesis
    # selection relative to the optimized objective (ADVICE r2)
    val, _ = _min_sqdist_2stage_fwd(x, y, y_bias)
    return val


def _exact_at(x, y, idx):
    """Exact f32 squared distance of x[m] to y[idx[m]]: [..., M]."""
    y_near = jnp.take_along_axis(y, idx[..., None], axis=-2)  # [..., M, 3]
    diff = x - y_near
    return jnp.sum(diff * diff, axis=-1), y_near


def _min_sqdist_2stage_fwd(x, y, y_bias):
    # center in f32 BEFORE the bf16 cast: bf16 resolution at a multi-meter
    # world offset (~3 cm at 5 m) would swamp the ~1 cm marker-surface gaps;
    # centered coordinates span ~1 m where bf16 resolves ~4 mm — enough to
    # rank, and the selected distance is recomputed exactly in f32 anyway
    c = jnp.mean(y, axis=-2, keepdims=True)
    xb = (x - c).astype(jnp.bfloat16)
    yb = (y - c).astype(jnp.bfloat16)
    d2b = squared_distance_matrix(xb, yb, precision=jax.lax.Precision.DEFAULT)
    d2b = d2b + y_bias[..., None, :].astype(jnp.bfloat16)
    idx = jnp.argmin(d2b, axis=-1)  # [..., M] bf16-ranked candidate
    val, _ = _exact_at(x, y, idx)
    val = val + jnp.take_along_axis(y_bias, idx, axis=-1)  # exact bias at the pick
    return val, (x, y, idx)


min_sqdist_2stage.defvjp(_min_sqdist_2stage_fwd, _min_sqdist_bwd)


# loss-path minimum: the Pallas-accelerated exact path by default;
# UUO_CHAMFER_2STAGE=1 opts into the bf16-ranked two-stage variant (measured
# slightly faster fwd but the win is dwarfed by the Pallas backward).
_LOSS_MIN = min_sqdist_2stage if os.environ.get("UUO_CHAMFER_2STAGE") == "1" else min_sqdist


def _min_over_rows(x: jnp.ndarray, y: jnp.ndarray, chunk: Optional[int]) -> jnp.ndarray:
    """min_v d^2(x, y) [..., M]; frame-chunk-scanned for [F, M, 3] inputs."""
    zero_bias = jnp.zeros(y.shape[:-1], y.dtype)
    if chunk is None or x.ndim != 3 or x.shape[0] <= chunk:
        return _LOSS_MIN(x, y, zero_bias)

    def step(arrs):
        x_c, y_c, b_c = arrs
        return _LOSS_MIN(x_c, y_c, b_c)

    return _scan_frame_chunks(step, (x, y, zero_bias), x.shape[0], chunk)


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
    BIG = 1e10
    ym_flat = jnp.broadcast_to(y_mask, y.shape[:-1]).astype(x.dtype)  # [..., V]
    xm = jnp.broadcast_to(x_mask, x.shape[:-1]).astype(x.dtype)
    y_bias = (1.0 - (ym_flat > 0)) * BIG
    chunked = frame_chunk is not None and x.ndim == 3 and x.shape[0] > frame_chunk

    if not chunked:
        d2_x = _LOSS_MIN(x, y, y_bias)  # [..., M]
        loss = jnp.sum(d2_x * xm) / jnp.maximum(jnp.sum(xm), 1e-12)
        if single_directional:
            return loss
        x_bias = (1.0 - (xm > 0)) * BIG
        d2_y = _LOSS_MIN(y, x, x_bias)
        return loss + jnp.sum(d2_y * ym_flat) / jnp.maximum(jnp.sum(ym_flat), 1e-12)

    F = x.shape[0]
    x_bias = (1.0 - (xm > 0)) * BIG

    def step(arrs):
        x_c, y_c, yb_c, xb_c = arrs
        d2_x = _LOSS_MIN(x_c, y_c, yb_c)  # [C, M]
        if single_directional:
            return d2_x, jnp.zeros(yb_c.shape, x_c.dtype)
        d2_y = _LOSS_MIN(y_c, x_c, xb_c)
        return d2_x, d2_y

    d2_x, d2_y = _scan_frame_chunks(step, (x, y, y_bias, x_bias), F, frame_chunk)
    loss = jnp.sum(d2_x * xm) / jnp.maximum(jnp.sum(xm), 1e-12)
    if single_directional:
        return loss
    return loss + jnp.sum(d2_y * ym_flat) / jnp.maximum(jnp.sum(ym_flat), 1e-12)


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
