"""Hierarchical (coarse-to-fine) nearest-vertex ranking.

The chamfer stage's ranking pass — argmin over all V=6890 vertices per
(frame, marker) — is at its XLA floor per element (Benchmarks.md round-3
counter-results: Pallas frame-blocking, V-tiling, and precision restructures
all land within noise or lose).  The remaining lever is doing LESS work:
rank against a static farthest-point subsample of the template (C centers),
then refine exactly among the fine vertices owned by the top-P centers'
template-space neighborhoods.

Per (frame, marker) the distance work drops from V to C + P*K
(~6890 -> ~1100 at the shipped table), and the refine step is f32-exact on
true vertex positions, so a disagreement with the dense argmin can only
occur when the true winner's owner cell is outside the candidate union —
bounded by construction (neighborhoods overlap), measured ~1e-4 flip rate
with near-equal distances (tools/bench_rank.py).

Replaces nothing in the reference (its ``compute_nearest_points`` /
chamfer run dense per-frame KD-tree queries on CPU,
``optimization.py:402-642``); this is the TPU-shaped equivalent of the
KD-tree's pruning.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.ops.chamfer import squared_distance_matrix


class RankTable(NamedTuple):
    """Static coarse-to-fine candidate structure (template-space)."""

    coarse_ids: np.ndarray  # [C] int32 — vertex ids of the coarse centers
    cand_ids: np.ndarray  # [C, K] int32 — fine candidates per coarse cell
    top_p: int  # number of coarse picks whose candidates are unioned


def _farthest_point_sample(points: np.ndarray, count: int, seed_idx: int = 0) -> np.ndarray:
    """Greedy farthest-point subsample: near-uniform surface coverage, so
    cell populations stay balanced and K stays small."""
    n = points.shape[0]
    chosen = np.empty(count, np.int64)
    chosen[0] = seed_idx
    d2 = np.sum((points - points[seed_idx]) ** 2, axis=1)
    for i in range(1, count):
        nxt = int(np.argmax(d2))
        chosen[i] = nxt
        d2 = np.minimum(d2, np.sum((points - points[nxt]) ** 2, axis=1))
    return chosen


def build_rank_table(
    template: np.ndarray,
    num_coarse: int = 640,
    num_cell_neighbors: int = 10,
    top_p: int = 2,
) -> RankTable:
    """Build the static table from the rest-pose template [V, 3].

    LBS is near-rigid per part with smooth blends, so template-space cell
    adjacency survives articulation; cross-part proximity under pose (hand
    near thigh) is covered by the COARSE stage running on posed centers —
    only the fine refinement uses template neighborhoods.
    """
    template = np.asarray(template, np.float64)
    centers_idx = _farthest_point_sample(template, num_coarse)
    centers = template[centers_idx]  # [C, 3]

    # owner cell per fine vertex
    d2_vc = (
        np.sum(template**2, 1)[:, None]
        - 2.0 * template @ centers.T
        + np.sum(centers**2, 1)[None, :]
    )  # [V, C]
    owner = np.argmin(d2_vc, axis=1)  # [V]

    # R nearest centers per center (template space, self included)
    d2_cc = (
        np.sum(centers**2, 1)[:, None]
        - 2.0 * centers @ centers.T
        + np.sum(centers**2, 1)[None, :]
    )
    nbr = np.argsort(d2_cc, axis=1)[:, :num_cell_neighbors]  # [C, R]

    members = [np.where(owner == c)[0] for c in range(num_coarse)]
    cand_lists = []
    for c in range(num_coarse):
        # seed with the cell's own center id: a degenerate template can give
        # a cell (and all its neighbors) zero owned vertices, and np.pad
        # mode='edge' crashes on an empty list
        cand = np.concatenate(
            [centers_idx[c : c + 1]] + [members[int(b)] for b in nbr[c]]
        )
        cand_lists.append(cand)
    K = max(len(c) for c in cand_lists)
    # pad by repeating the first candidate — duplicates are harmless in an
    # argmin over exactly-evaluated distances
    cand_ids = np.stack(
        [np.pad(c, (0, K - len(c)), mode="edge") for c in cand_lists]
    ).astype(np.int32)
    return RankTable(centers_idx.astype(np.int32), cand_ids, int(top_p))


_TABLE_CACHE: dict = {}


def rank_table_for(model, **kw) -> RankTable:
    """Per-model table cache.  The value holds a ``weakref`` to the model
    (identity-checked — id() alone can alias after GC) so cached tables
    never keep dead models alive; dead entries are pruned on every call."""
    import weakref

    for k in [k for k, (ref, _) in _TABLE_CACHE.items() if ref() is None]:
        del _TABLE_CACHE[k]
    key = (id(model), tuple(sorted(kw.items())))
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0]() is model:
        return hit[1]
    table = build_rank_table(np.asarray(model.v_template), **kw)
    try:
        _TABLE_CACHE[key] = (weakref.ref(model), table)
    except TypeError:  # non-weakrefable model type: skip caching
        pass
    return table


def hierarchical_nearest(
    markers: jnp.ndarray,  # [F, M, 3]
    verts: jnp.ndarray,  # [F, V, 3]
    table: RankTable,
    frame_chunk: int = 64,
) -> jnp.ndarray:
    """Coarse-to-fine argmin vertex per marker -> [F, M] int32.

    Frame-chunked like the dense ranking so the [chunk, M, C] coarse
    distance block (not [F, M, V]) bounds live memory under lane vmap.
    """
    coarse_ids = jnp.asarray(table.coarse_ids)
    cand_ids = jnp.asarray(table.cand_ids)
    P = int(table.top_p)
    F, M = markers.shape[0], markers.shape[1]

    def one(m_c, v_c):
        cverts = v_c[:, coarse_ids]  # [Cf, C, 3]
        d2c = squared_distance_matrix(m_c, cverts)  # [Cf, M, C]
        picks = []
        for _ in range(P):
            ci = jnp.argmin(d2c, axis=-1)  # [Cf, M]
            picks.append(ci)
            if len(picks) < P:
                d2c = d2c + 1e30 * jax.nn.one_hot(ci, d2c.shape[-1], dtype=d2c.dtype)
        cand = jnp.concatenate([cand_ids[c] for c in picks], axis=-1)  # [Cf, M, P*K]
        gathered = jax.vmap(lambda v_f, i_f: v_f[i_f])(v_c, cand)  # [Cf, M, PK, 3]
        d2f = jnp.sum((m_c[:, :, None, :] - gathered) ** 2, axis=-1)  # [Cf, M, PK]
        j = jnp.argmin(d2f, axis=-1)  # [Cf, M]
        return jnp.take_along_axis(cand, j[..., None], axis=-1)[..., 0].astype(jnp.int32)

    C = frame_chunk
    if F <= C:
        return one(markers, verts)
    pad = (-F) % C
    K = (F + pad) // C

    def pad_r(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((K, C) + a.shape[1:])

    idx = jax.lax.map(lambda mv: one(*mv), (pad_r(markers), pad_r(verts)))
    return idx.reshape(K * C, -1)[:F]
