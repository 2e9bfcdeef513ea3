"""Hierarchical coarse-to-fine ranking: selection quality + sparse-chamfer
agreement with the dense path (ops/rank_hier.py — opt-in, see Benchmarks.md
round-3 counter-result for why it is not the default)."""
import numpy as np
import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.rank_hier import build_rank_table, rank_table_for
from uuo_mocap_tpu.pipeline import stages as S


def _scene(F=9, M=17, seed=0):
    model = synthetic_body_model()
    rng = np.random.RandomState(seed)
    pose = rot.rotation_6d_to_matrix(jnp.asarray(
        np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (F, 23, 1))
        + rng.randn(F, 23, 6).astype(np.float32) * 0.03))
    root = jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3))
    trans = jnp.asarray(rng.randn(F, 3).astype(np.float32) * 0.1)
    betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.1)
    sp = S.SmplParams(pose, betas, root, trans)
    verts = lbs_forward(model, pose, jnp.broadcast_to(betas, (F, 10)), root, trans)["vertices"]
    vids = rng.randint(0, verts.shape[1], size=(F, M))
    markers = jnp.asarray(np.take_along_axis(np.asarray(verts), vids[..., None], axis=1)
                          + rng.randn(F, M, 3).astype(np.float32) * 0.02)
    return model, sp, verts, markers


def test_table_structure():
    model = synthetic_body_model()
    t = build_rank_table(np.asarray(model.v_template), num_coarse=128,
                         num_cell_neighbors=6, top_p=2)
    V = model.v_template.shape[0]
    assert t.coarse_ids.shape == (128,) and len(set(t.coarse_ids.tolist())) == 128
    assert t.cand_ids.min() >= 0 and t.cand_ids.max() < V
    # every cell's candidate set contains the cell's own members
    owner_of_center = t.cand_ids[np.arange(128)]
    for c in (0, 31, 127):
        assert t.coarse_ids[c] in owner_of_center[c]


def test_hier_matches_dense_selection_quality():
    model, sp, verts, markers = _scene()
    table = rank_table_for(model)
    idx_d = S._ranked_nearest(markers, verts)
    idx_h = S._ranked_nearest(markers, verts, table=table)
    # distances at the picks must match to near-exactness even where the
    # vertex ids differ (ties between equidistant vertices are harmless)
    def d_at(idx):
        g = jnp.take_along_axis(verts, idx[..., None].astype(jnp.int32).repeat(3, -1), axis=1)
        return jnp.sqrt(jnp.sum((markers - g) ** 2, -1) + 1e-18)
    rel = jnp.abs(d_at(idx_h) - d_at(idx_d)) / jnp.maximum(d_at(idx_d), 1e-9)
    assert float(jnp.max(rel)) < 5e-2
    assert float(jnp.mean((idx_d == idx_h).astype(jnp.float32))) > 0.97


def test_sparse_chamfer_value_and_grad_agree():
    model, sp, verts, markers = _scene()
    table = rank_table_for(model)
    w = jnp.ones(markers.shape[:2])
    v_d = float(S._sparse_chamfer(model, sp, markers, w))
    v_h = float(S._sparse_chamfer(model, sp, markers, w, table=table))
    assert abs(v_d - v_h) / max(v_d, 1e-12) < 1e-3
    g_d = jax.grad(lambda t: S._sparse_chamfer(
        model, S.SmplParams(sp.pose_body, sp.betas, sp.root_orient, t), markers, w))(sp.trans)
    g_h = jax.grad(lambda t: S._sparse_chamfer(
        model, S.SmplParams(sp.pose_body, sp.betas, sp.root_orient, t), markers, w,
        table=table))(sp.trans)
    rel = float(jnp.max(jnp.abs(g_d - g_h))) / (float(jnp.max(jnp.abs(g_d))) + 1e-12)
    assert rel < 1e-3
