"""Pallas TPU kernel: fused masked nearest-vertex distance.

The solver's hottest op is min_v ||marker - vertex||^2 over [B, M, V]
(B = hypotheses x frames, M ~ 41 markers, V = 6890 vertices), evaluated
thousands of times per solve inside the L-BFGS stages.  The XLA fallback
(`ops.chamfer.min_sqdist`) recomputes the distance product per reduction;
this kernel computes x^2 + y^2 - 2xy + bias tile-by-tile in VMEM and keeps
only the running (min, argmin) — one pass, no [M, V] tensor ever leaves
registers/VMEM.

Layout: coordinates ride the sublanes (3 -> 8 pad), markers/vertices ride
the lanes (M -> 128, V -> multiple of the 512 tile).  One grid program per
batch element; V is swept in 512-wide tiles with the cross term on the MXU.

The backward pass reuses the argmin (gather + O(M) scatter) — shared with
the XLA path via the custom VJP in ``ops.chamfer``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_PAD = 64  # marker sublane width (fits every layout the datasets use)
V_TILE = 512


def _kernel(x_ref, y_ref, bias_ref, val_ref, idx_ref):
    """Per-batch-element program.

    x_ref   [1, 8, M_PAD]   coords x markers (rows 3.. are zero)
    y_ref   [1, 8, V_pad]   coords x vertices
    bias_ref[1, 8, V_pad]   vertex exclusion bias on row 0
    val_ref [1, 1, M_PAD]   min squared distance
    idx_ref [1, 1, M_PAD]   argmin vertex id (int32)
    """
    x = x_ref[0, :3, :]  # [3, M]
    x2 = jnp.sum(x * x, axis=0)  # [M]
    xt = x.T  # [M, 3]

    v_pad = y_ref.shape[2]
    num_tiles = v_pad // V_TILE

    def body(t, carry):
        best_val, best_idx = carry
        y = y_ref[0, :3, pl.ds(t * V_TILE, V_TILE)]  # [3, T]
        bias = bias_ref[0, 0, pl.ds(t * V_TILE, V_TILE)]  # [T]
        y2 = jnp.sum(y * y, axis=0)  # [T]
        # f32-exact MXU cross term (HIGHEST = multi-pass bf16 with error
        # correction; the default single pass flips ~7% of argmins)
        xy = jnp.dot(xt, y, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [M, T]
        d2 = x2[:, None] + (y2 + bias)[None, :] - 2.0 * xy  # [M, T]
        tile_min = jnp.min(d2, axis=1)  # [M]
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + t * V_TILE
        take = tile_min < best_val
        return jnp.where(take, tile_min, best_val), jnp.where(take, tile_arg, best_idx)

    init = (jnp.full((M_PAD,), 1e30, jnp.float32), jnp.zeros((M_PAD,), jnp.int32))
    best_val, best_idx = jax.lax.fori_loop(0, num_tiles, body, init)
    val_ref[0, 0, :] = jnp.maximum(best_val, 0.0)
    idx_ref[0, 0, :] = best_idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_sqdist_pallas(x: jnp.ndarray, y: jnp.ndarray, y_bias: jnp.ndarray,
                      interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (min d^2, argmin) over the vertex axis.

    x [..., M, 3], y [..., V, 3], y_bias [..., V] -> ([..., M], [..., M] int32).
    Centering against the bf16 MXU cross term happens here (same policy as
    the XLA path).
    """
    batch_shape = x.shape[:-2]
    M = x.shape[-2]
    V = y.shape[-2]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    if M > M_PAD:
        raise ValueError(f"M={M} exceeds kernel lane width {M_PAD}")

    # center about the per-element y centroid (keeps the f32->MXU cross term
    # accurate; see ops.chamfer.squared_distance_matrix)
    c = jnp.mean(y, axis=-2, keepdims=True)
    x = (x - c).reshape(B, M, 3)
    y = (y - c).reshape(B, V, 3)
    bias = jnp.broadcast_to(y_bias, batch_shape + (V,)).reshape(B, V)

    v_pad = ((V + V_TILE - 1) // V_TILE) * V_TILE

    # coords on sublanes, entities on lanes
    x_t = jnp.zeros((B, 8, M_PAD), jnp.float32).at[:, :3, :M].set(jnp.swapaxes(x, -1, -2))
    y_t = jnp.full((B, 8, v_pad), 1e6, jnp.float32).at[:, :3, :V].set(jnp.swapaxes(y, -1, -2))
    b_t = jnp.zeros((B, 8, v_pad), jnp.float32).at[:, 0, :V].set(bias)
    b_t = b_t.at[:, 0, V:].set(1e30)  # padded vertices never win

    val, idx = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, M_PAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, v_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, v_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, M_PAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_PAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M_PAD), jnp.int32),
        ),
        interpret=interpret,
    )(x_t, y_t, b_t)

    val = val[:, 0, :M].reshape(batch_shape + (M,))
    idx = idx[:, 0, :M].reshape(batch_shape + (M,))
    return val, idx


def _bwd_kernel(idx_ref, diff_ref, dy_ref):
    """Backward of min-over-vertices without a scatter:
    dy[v] = -sum_m diff[m] * [idx[m] == v] and dbias[v] = sum_m g[m] *
    [idx[m] == v], computed per V tile as one [4, M] x [M, T] one-hot
    matmul on the MXU.  Replaces the XLA scatter-add — the single most
    expensive op of the solve (measured ~11 ms of the 33 ms canonical
    closure eval).

    idx_ref  [1, 1, M_PAD] int32 (argmin vertex per marker; -1 pads)
    diff_ref [1, 8, M_PAD] rows 0..2 = upstream 2*(x - y_near)*g, row 3 = g
    dy_ref   [1, 8, V_pad] rows 0..2 = dy^T, row 3 = dbias
    """
    idx = idx_ref[0, 0, :]  # [M]
    diff = diff_ref[0, :4, :]  # [4, M]
    v_pad = dy_ref.shape[2]
    num_tiles = v_pad // V_TILE
    # rows 0..2 (dy) flip sign, row 3 (dbias) keeps it: fold the sign into
    # the row index (constants can't be captured by the kernel)
    sign = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0) < 3, -1.0, 1.0)

    def body(t, _):
        tile_ids = t * V_TILE + jax.lax.broadcasted_iota(jnp.int32, (M_PAD, V_TILE), 1)
        onehot = (idx[:, None] == tile_ids).astype(jnp.float32)  # [M, T]
        contrib = jnp.dot(diff, onehot, preferred_element_type=jnp.float32)  # [4, T]
        dy_ref[0, :4, pl.ds(t * V_TILE, V_TILE)] = sign * contrib
        return 0

    dy_ref[0, 4:, :] = jnp.zeros((4, v_pad), jnp.float32)
    jax.lax.fori_loop(0, num_tiles, body, 0)


def make_min_grad_y(V: int):
    """Build the (dy, dbias) kernel for a fixed vertex count.
    run(idx [..., M] int32, diff [..., M, 3], g [..., M])
      -> (dy [..., V, 3], dbias [..., V])."""
    v_pad = ((V + V_TILE - 1) // V_TILE) * V_TILE

    @jax.jit
    def run(idx: jnp.ndarray, diff: jnp.ndarray, g: jnp.ndarray):
        batch_shape = idx.shape[:-1]
        M = idx.shape[-1]
        B = int(np.prod(batch_shape)) if batch_shape else 1
        if M > M_PAD:
            raise ValueError(f"M={M} exceeds kernel lane width {M_PAD}")

        idx_t = jnp.full((B, 1, M_PAD), -1, jnp.int32).at[:, 0, :M].set(idx.reshape(B, M))
        diff_t = jnp.zeros((B, 8, M_PAD), jnp.float32).at[:, :3, :M].set(
            jnp.swapaxes(diff.reshape(B, M, 3), -1, -2)
        )
        diff_t = diff_t.at[:, 3, :M].set(g.reshape(B, M))
        out = pl.pallas_call(
            _bwd_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, M_PAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, M_PAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, v_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, v_pad), jnp.float32),
        )(idx_t, diff_t)
        dy = jnp.swapaxes(out[:, :3, :V], -1, -2).reshape(batch_shape + (V, 3))
        dbias = out[:, 3, :V].reshape(batch_shape + (V,))
        return dy, dbias

    return run


F_BLOCK = 8  # frames per grid program in the ranking kernel


def _rank_kernel(x_ref, y_ref, bias_ref, idx_ref):
    """Frame-blocked argmin-vertex program.

    The round-2 fused (min,argmin) kernel ran ONE grid program per frame
    (B~1800 at the canonical closure) and was launch-bound: 8.4 ms, exactly
    matching XLA's fused pass.  This variant amortizes launch overhead by
    sweeping F_BLOCK frames per program — the per-program vertex block is
    F_BLOCK x 8 x v_pad (~1.8 MB at V=6890), well inside VMEM with double
    buffering.

    x_ref   [F_BLOCK, 8, M_PAD]   coords x markers (rows 3.. zero)
    y_ref   [F_BLOCK, 8, V_pad]   coords x vertices
    bias_ref[8, V_pad]            per-lane vertex exclusion bias on row 0
                                  (shared across frames; 1e30 on pad lanes)
    idx_ref [F_BLOCK, 1, M_PAD]   argmin vertex id (int32)
    """
    v_pad = y_ref.shape[2]
    num_tiles = v_pad // V_TILE

    def frame(f, _):
        x = x_ref[f, :3, :]  # [3, M]
        x2 = jnp.sum(x * x, axis=0)  # [M]
        xt = x.T  # [M, 3]

        def body(t, carry):
            best_val, best_idx = carry
            y = y_ref[f, :3, pl.ds(t * V_TILE, V_TILE)]  # [3, T]
            bias = bias_ref[0, pl.ds(t * V_TILE, V_TILE)]  # [T]
            y2 = jnp.sum(y * y, axis=0)  # [T]
            xy = jnp.dot(xt, y, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [M, T]
            d2 = x2[:, None] + (y2 + bias)[None, :] - 2.0 * xy  # [M, T]
            tile_min = jnp.min(d2, axis=1)  # [M]
            tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + t * V_TILE
            take = tile_min < best_val
            return jnp.where(take, tile_min, best_val), jnp.where(take, tile_arg, best_idx)

        init = (jnp.full((M_PAD,), 1e30, jnp.float32), jnp.zeros((M_PAD,), jnp.int32))
        _, best_idx = jax.lax.fori_loop(0, num_tiles, body, init)
        idx_ref[f, 0, :] = best_idx
        return 0

    jax.lax.fori_loop(0, F_BLOCK, frame, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ranked_nearest_pallas(markers: jnp.ndarray, verts: jnp.ndarray,
                          y_bias: jnp.ndarray | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Frame-blocked no-grad argmin vertex per marker.

    markers [F, M, 3], verts [F, V, 3], y_bias [V] or None -> [F, M] int32.
    Drop-in for the ranking half of ``pipeline.stages._ranked_nearest``
    (reference capability: the nearest-vertex correspondence of
    ``optimization.py:402-642``); composes with vmap over lanes — the lane
    axis becomes a leading grid dimension.
    """
    F, M = markers.shape[0], markers.shape[1]
    V = verts.shape[1]
    if M > M_PAD:
        raise ValueError(f"M={M} exceeds kernel lane width {M_PAD}")

    c = jnp.mean(verts, axis=-2, keepdims=True)  # [F, 1, 3]
    x = markers - c
    y = verts - c

    f_pad = ((F + F_BLOCK - 1) // F_BLOCK) * F_BLOCK
    v_pad = ((V + V_TILE - 1) // V_TILE) * V_TILE

    x_t = jnp.zeros((f_pad, 8, M_PAD), jnp.float32).at[:F, :3, :M].set(
        jnp.swapaxes(x, -1, -2))
    y_t = jnp.full((f_pad, 8, v_pad), 1e6, jnp.float32).at[:F, :3, :V].set(
        jnp.swapaxes(y, -1, -2))
    b_t = jnp.full((8, v_pad), 1e30, jnp.float32)
    b_t = b_t.at[0, :V].set(jnp.zeros((V,), jnp.float32) if y_bias is None
                            else y_bias.astype(jnp.float32))

    idx = pl.pallas_call(
        _rank_kernel,
        grid=(f_pad // F_BLOCK,),
        in_specs=[
            pl.BlockSpec((F_BLOCK, 8, M_PAD), lambda fb: (fb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F_BLOCK, 8, v_pad), lambda fb: (fb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, v_pad), lambda fb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F_BLOCK, 1, M_PAD), lambda fb: (fb, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, 1, M_PAD), jnp.int32),
        interpret=interpret,
    )(x_t, y_t, b_t)
    return idx[:F, 0, :M]


def pallas_available() -> bool:
    """True when the default backend can run the TPU kernel."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
