"""Body model tests: synthetic asset validity + LBS forward vs a pure-NumPy
reference implementation (the unit-test layer the reference repo lacks,
SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from uuo_mocap_tpu.body.model import (
    EXTRA_JOINT_VERTEX_IDS,
    NUM_JOINTS,
    NUM_VERTICES,
    PARENTS,
    lbs_forward,
    load_body_model,
)
from uuo_mocap_tpu.body.smpl import SmplInference, SmplInferenceGender
from uuo_mocap_tpu.body.synthetic import export_synthetic_npz, synthetic_body_model

RNG = np.random.RandomState(7)


def numpy_lbs(model, pose_body, betas, root_orient, trans):
    """Straight-line NumPy SMPL forward (float64) — independent oracle."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_regressor = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.lbs_weights, np.float64)

    F = pose_body.shape[0]
    out_v = np.zeros((F, NUM_VERTICES, 3))
    out_j = np.zeros((F, 24, 3))
    for f in range(F):
        v_shaped = v_template + shapedirs @ betas[f]
        joints = j_regressor @ v_shaped
        rots = np.concatenate([root_orient[f], pose_body[f]], axis=0)  # [24,3,3]
        pose_feature = (pose_body[f] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feature @ posedirs).reshape(NUM_VERTICES, 3)

        G = np.zeros((24, 4, 4))
        for j in range(24):
            T = np.eye(4)
            T[:3, :3] = rots[j]
            T[:3, 3] = joints[j] - (joints[PARENTS[j]] if PARENTS[j] >= 0 else 0)
            G[j] = (G[PARENTS[j]] if PARENTS[j] >= 0 else np.eye(4)) @ T
        out_j[f] = G[:, :3, 3]
        # remove rest-pose joint locations
        A = G.copy()
        for j in range(24):
            A[j, :3, 3] -= G[j, :3, :3] @ joints[j]
        T_v = np.einsum("vj,jab->vab", weights, A)
        out_v[f] = np.einsum("vab,vb->va", T_v[:, :3, :3], v_posed) + T_v[:, :3, 3]
        out_v[f] += trans[f]
        out_j[f] += trans[f]
    return out_j, out_v


@pytest.fixture(scope="module")
def model():
    return synthetic_body_model()


def test_synthetic_model_shapes(model):
    assert model.v_template.shape == (6890, 3)
    assert model.shapedirs.shape == (6890, 3, 10)
    assert model.posedirs.shape == (207, 6890 * 3)
    assert model.j_regressor.shape == (24, 6890)
    assert model.lbs_weights.shape == (6890, 24)
    assert model.faces.shape == (13776, 3)
    # LBS weights: rows sum to 1, at most 4 nonzero
    w = np.asarray(model.lbs_weights)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    assert (np.count_nonzero(w, axis=1) <= 4).all()
    # regressor rows are convex combinations
    jr = np.asarray(model.j_regressor)
    np.testing.assert_allclose(jr.sum(1), 1.0, atol=1e-5)
    assert (jr >= 0).all()


def test_synthetic_mesh_is_closed(model):
    """Every edge shared by exactly 2 faces (closed manifold)."""
    from collections import Counter

    edges = Counter()
    for tri in model.faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(min(a, b), max(a, b))] += 1
    assert set(edges.values()) == {2}
    # Euler characteristic chi = V - E + F = 2 (genus 0)
    assert NUM_VERTICES - len(edges) + len(model.faces) == 2


def test_zero_pose_rest_vertices(model):
    F = 2
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (F, 23, 3, 3))
    root = np.broadcast_to(np.eye(3, dtype=np.float32), (F, 1, 3, 3))
    betas = np.zeros((F, 10), np.float32)
    trans = np.zeros((F, 3), np.float32)
    out = lbs_forward(model, jnp.asarray(eye), jnp.asarray(betas), jnp.asarray(root), jnp.asarray(trans))
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]), np.asarray(model.v_template), atol=1e-5
    )
    assert out["joints"].shape == (F, 45, 3)
    np.testing.assert_allclose(
        np.asarray(out["joints"][0, 24:]),
        np.asarray(model.v_template)[EXTRA_JOINT_VERTEX_IDS],
        atol=1e-5,
    )


def test_lbs_matches_numpy_reference(model):
    F = 3
    pose = ScipyRot.from_rotvec(RNG.randn(F * 23, 3) * 0.3).as_matrix().reshape(F, 23, 3, 3)
    root = ScipyRot.from_rotvec(RNG.randn(F, 3) * 0.5).as_matrix().reshape(F, 1, 3, 3)
    betas = RNG.randn(F, 10).astype(np.float32) * 0.5
    trans = RNG.randn(F, 3).astype(np.float32)

    out = lbs_forward(
        model,
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(betas),
        jnp.asarray(root, jnp.float32),
        jnp.asarray(trans),
    )
    ref_j, ref_v = numpy_lbs(model, pose, betas, root, trans)
    np.testing.assert_allclose(np.asarray(out["vertices"]), ref_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["joints"][:, :24]), ref_j, atol=2e-5)


def test_global_translation_and_rotation_equivariance(model):
    F = 2
    pose = ScipyRot.from_rotvec(RNG.randn(F * 23, 3) * 0.2).as_matrix().reshape(F, 23, 3, 3).astype(np.float32)
    eye_root = np.broadcast_to(np.eye(3, dtype=np.float32), (F, 1, 3, 3))
    betas = np.zeros((F, 10), np.float32)
    t0 = np.zeros((F, 3), np.float32)
    t1 = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (F, 1))

    out0 = lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(eye_root), jnp.asarray(t0))
    out1 = lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(eye_root), jnp.asarray(t1))
    np.testing.assert_allclose(
        np.asarray(out1["vertices"]), np.asarray(out0["vertices"]) + t1[:, None], atol=1e-5
    )

    # rotating the root rotates vertices about the root joint
    Rz = ScipyRot.from_rotvec([0, 0, np.pi / 3]).as_matrix().astype(np.float32)
    root_r = np.broadcast_to(Rz, (F, 1, 3, 3))
    out_r = lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(root_r), jnp.asarray(t0))
    pivot = np.asarray(
        lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(eye_root), jnp.asarray(t0))["joints"]
    )[:, 0]
    expect = (np.asarray(out0["vertices"]) - pivot[:, None]) @ Rz.T + pivot[:, None]
    np.testing.assert_allclose(np.asarray(out_r["vertices"]), expect, atol=1e-4)


def test_batched_leading_dims(model):
    """Hypothesis x frame batching — the TPU-native replacement for the
    reference's sequential hypothesis loops (SURVEY.md §2.8)."""
    H, F = 2, 3
    pose = np.broadcast_to(np.eye(3, dtype=np.float32), (H, F, 23, 3, 3))
    root = np.broadcast_to(np.eye(3, dtype=np.float32), (H, F, 1, 3, 3))
    betas = np.zeros((H, F, 10), np.float32)
    trans = RNG.randn(H, F, 3).astype(np.float32)
    out = lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(root), jnp.asarray(trans))
    assert out["vertices"].shape == (H, F, 6890, 3)
    assert out["joints"].shape == (H, F, 45, 3)


def test_smpl_inference_wrapper(model):
    smpl = SmplInference(model)
    F = 2
    out = smpl(
        jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 23, 3, 3))),
        jnp.zeros((F, 10)),
        jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 1, 3, 3))),
        jnp.zeros((F, 3)),
    )
    assert out["vertices"].shape == (F, 6890, 3)
    with pytest.raises(ValueError):
        smpl(
            jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 23, 3, 3))),
            jnp.zeros((F, 9)),
            jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 1, 3, 3))),
            jnp.zeros((F, 3)),
        )


def test_smpl_inference_gender_blend():
    smpl = SmplInferenceGender()
    N, F = 2, 2
    poses = np.zeros((N, F, 69), np.float32)
    betas = np.zeros((N, 10), np.float32)
    root = np.zeros((N, F, 3), np.float32)
    trans = np.zeros((N, F, 3), np.float32)
    one_hot_m = np.tile(np.array([[1.0, 0.0]], np.float32), (N, 1))
    one_hot_f = np.tile(np.array([[0.0, 1.0]], np.float32), (N, 1))
    out_m = smpl(jnp.asarray(poses), jnp.asarray(betas), jnp.asarray(root), jnp.asarray(trans), jnp.asarray(one_hot_m))
    out_f = smpl(jnp.asarray(poses), jnp.asarray(betas), jnp.asarray(root), jnp.asarray(trans), jnp.asarray(one_hot_f))
    assert out_m["joints"].shape == (N, F, 24, 3)
    assert out_m["vertices"].shape == (N, F, 6890, 3)
    # male is scaled 1.05/0.94 of female in the synthetic assets — must differ
    assert np.abs(np.asarray(out_m["vertices"]) - np.asarray(out_f["vertices"])).max() > 0.01
    out_pl = smpl(
        jnp.asarray(poses), jnp.asarray(betas), jnp.asarray(root), jnp.asarray(trans),
        jnp.asarray(one_hot_m), compute_part_labels=True,
    )
    assert out_pl["vertex_part_labels"].shape == (N, 6890, 24)


def test_npz_roundtrip(tmp_path, model):
    path = export_synthetic_npz(str(tmp_path / "synthetic_smpl.npz"))
    loaded = load_body_model(path)
    np.testing.assert_allclose(np.asarray(loaded.v_template), np.asarray(model.v_template))
    np.testing.assert_allclose(np.asarray(loaded.posedirs), np.asarray(model.posedirs), atol=1e-6)
    F = 1
    out = lbs_forward(
        loaded,
        jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 23, 3, 3))),
        jnp.zeros((F, 10)),
        jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (F, 1, 3, 3))),
        jnp.zeros((F, 3)),
    )
    assert np.isfinite(np.asarray(out["vertices"])).all()


def test_lbs_forward_at_matches_dense():
    """The gathered forward (sparse-gradient hot path) is bit-equal to
    indexing the dense forward, for static and per-frame vertex ids."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward, lbs_forward_at
    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.synthetic import random_pose_sequence

    model = synthetic_body_model()
    gt = random_pose_sequence(4, seed=7)
    F = 4
    betas = jnp.broadcast_to(gt.betas, (F, 10))
    full = lbs_forward(model, gt.pose_body, betas, gt.root_orient, gt.trans)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.choice(model.num_vertices, 11, replace=False))
    at = lbs_forward_at(model, gt.pose_body, betas, gt.root_orient, gt.trans, ids)
    assert float(jnp.max(jnp.abs(at["points"] - full["vertices"][:, ids]))) < 1e-5
    assert float(jnp.max(jnp.abs(at["joints"] - full["joints"][:, :24]))) < 1e-5

    ids_f = jnp.asarray(rng.randint(0, model.num_vertices, size=(F, 11)))
    at2 = lbs_forward_at(model, gt.pose_body, betas, gt.root_orient, gt.trans, ids_f)
    ref = jnp.take_along_axis(full["vertices"], ids_f[..., None].repeat(3, -1), axis=1)
    assert float(jnp.max(jnp.abs(at2["points"] - ref))) < 1e-5

    g = jax.grad(lambda p: float(0) + jnp.sum(
        lbs_forward_at(model, p, betas, gt.root_orient, gt.trans, ids)["points"]
    ))(gt.pose_body)
    assert bool(jnp.isfinite(g).all())


def test_sparse_chamfer_matches_dense():
    """_sparse_chamfer (stop-grad ranking + gathered differentiable LBS)
    equals masked_chamfer of the dense forward in value AND gradient."""
    import jax
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.synthetic import generate_markers, random_pose_sequence
    from uuo_mocap_tpu.ops.chamfer import masked_chamfer
    from uuo_mocap_tpu.pipeline.stages import SmplParams, _forward, _sparse_chamfer

    model = synthetic_body_model()
    gt = random_pose_sequence(5, seed=1)
    mk = generate_markers(model, gt, num_markers=9, seed=2)
    markers = jnp.asarray(mk.points)
    w = jnp.ones(markers.shape[:2])

    def loss_dense(p):
        sp = SmplParams(p["pose"], p["betas"], p["root"], p["trans"])
        return masked_chamfer(markers, _forward(model, sp)["vertices"], w)

    def loss_sparse(p):
        sp = SmplParams(p["pose"], p["betas"], p["root"], p["trans"])
        return _sparse_chamfer(model, sp, markers, w)

    p = {"pose": gt.pose_body, "betas": gt.betas + 0.08,
         "root": gt.root_orient, "trans": gt.trans + 0.03}
    vd, gd = jax.value_and_grad(loss_dense)(p)
    vs, gs = jax.value_and_grad(loss_sparse)(p)
    assert abs(float(vd) - float(vs)) < 1e-7
    for k in p:
        assert float(jnp.max(jnp.abs(gd[k] - gs[k]))) < 1e-4, k
