"""Neural model + training smoke tests (forward shapes, loss decrease,
checkpoint roundtrip, segmenter learns on easy synthetic data)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.models import (
    FootContactModel,
    JointEmbedding,
    MarkerEmbedding,
    MarkerSegmenter,
    MarkerSegmenterMultimodal,
    MarkerTrackingAttention,
    PermutationLearningModel,
    Pos2BC,
    PosDiff,
)
from uuo_mocap_tpu.models import train as T
from uuo_mocap_tpu.models.checkpoints import load_params, save_params


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_marker_segmenter_shapes_and_permutation_equivariance():
    model = MarkerSegmenter(latent_dim=16)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 32, 10, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts)
    logits = model.apply(params, pts)
    assert logits.shape == (2, 10, 24)
    # permuting markers permutes outputs identically
    perm = rng.permutation(10)
    logits_p = model.apply(params, pts[:, :, perm])
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits)[:, perm], atol=1e-4)


def test_marker_segmenter_forward_sequence():
    model = MarkerSegmenter(latent_dim=16)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(1, 32, 8, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts)
    seq = jnp.asarray(rng.randn(300, 8, 3).astype(np.float32))
    probs = model.forward_sequence(params, seq)
    assert probs.shape == (300, 8, 24)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


def test_multimodal_segmenter_shapes():
    model = MarkerSegmenterMultimodal(latent_dim=16)
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(2, 32, 9, 3).astype(np.float32))
    jts = jnp.asarray(rng.randn(2, 32, 22, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts, jts)
    assert model.apply(params, pts, jts).shape == (2, 9, 24)


def test_pos_models_shapes(body):
    p2bc = Pos2BC(num_vertices=body.num_vertices)
    params = p2bc.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
    assert p2bc.apply(params, jnp.zeros((4, 3))).shape == (4, body.num_vertices)
    pdiff = PosDiff()
    dparams = pdiff.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
    assert pdiff.apply(dparams, jnp.zeros((4, 3))).shape == (4, 3)


def test_foot_contact_model_shapes():
    model = FootContactModel(latent_dim=16)
    jts = jnp.zeros((2, 40, 22, 3))
    params = model.init(jax.random.PRNGKey(0), jts)
    assert model.apply(params, jts).shape == (2, 40, 2)


def test_marker_tracking_models():
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
    perm_model = PermutationLearningModel(latent_dim=16, num_markers=6)
    params = perm_model.init(jax.random.PRNGKey(0), pts)
    P = perm_model.apply(params, pts)
    assert P.shape == (1, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(P.sum(-1)), 1.0, atol=1e-2)  # row-stochastic
    np.testing.assert_allclose(np.asarray(P.sum(-2)), 1.0, atol=1e-2)  # col-stochastic
    attn = MarkerTrackingAttention(latent_dim=16, num_markers=6, num_layers=1)
    aparams = attn.init(jax.random.PRNGKey(0), pts)
    assert attn.apply(aparams, pts).shape == (1, 4, 6, 6)


def test_train_marker_segmenter_runs(body):
    """Machinery smoke: the pooled loop executes, the loss stays sane, and
    the optimizer actually moves the params.  The round-5 attention
    segmenter needs O(10^3) steps before its loss moves materially (LN +
    attention warmup) — far past a fast-tier budget — so CONVERGENCE is
    gated by tests/test_demo_checkpoints.py against the shipped manifest
    (multimodal >= 70% held-out, cmu_41 layout >= 85%/95%), not here."""
    import jax as _jax

    params, hist = T.train_marker_segmenter(
        body, steps=30, batch=4, num_markers=24, seed=1,
        pool_seqs=16, verts_per_seq=128, latent_dim=32)
    assert np.all(np.isfinite(hist)), hist
    assert hist[-1] < hist[0] * 1.2, hist  # not diverging
    model = __import__("uuo_mocap_tpu.models.marker_segmenter",
                       fromlist=["MarkerSegmenter"]).MarkerSegmenter(latent_dim=32)
    pts0, _, _ = T._segmentation_batch(body, 1, 24, seed=9999)
    init = model.init(_jax.random.PRNGKey(1), pts0)  # same seed as the train call
    moved = _jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))), params, init)
    assert max(_jax.tree_util.tree_leaves(moved)) > 1e-4  # params updated


def test_train_pos2bc_and_pos_diff(body):
    params, hist = T.train_pos2bc(body, steps=30, batch=128, seed=1, pool_n=2048)
    assert hist[-1] < hist[0]
    dparams, dhist = T.train_pos_diff(body, steps=30, batch=128, seed=1, pool_n=1024)
    assert dhist[-1] < dhist[0]


def test_train_motion_embedding_and_alignment(body):
    (m_params, j_params), hist = T.train_motion_embedding(body, steps=100, batch=8, seed=1)
    # smoke check: below the chance level ln(8)~2.079 by the end
    assert np.mean(hist[-5:]) < 2.0, (hist[:5], hist[-5:])
    from uuo_mocap_tpu.models.motion_embedding import TemporalAlignmentModel

    tam = TemporalAlignmentModel(m_params, j_params, window=16)
    # same sequence, no offset -> recovered offset should be near 0
    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.data.synthetic import random_pose_sequence

    gt = random_pose_sequence(80, seed=5)
    out = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (80, 10)), gt.root_orient, gt.trans)
    rng = np.random.RandomState(0)
    vid = rng.choice(body.num_vertices, 30, replace=False)
    offset, costs = tam.compute_offset(out["vertices"][:, vid], out["joints"][:, :22])
    assert abs(offset) <= 40  # sane range; exact zero needs longer training


def test_checkpoint_roundtrip(tmp_path, body):
    model = MarkerSegmenter(latent_dim=16)
    pts = jnp.zeros((1, 32, 8, 3))
    params = model.init(jax.random.PRNGKey(0), pts)
    save_params(params, str(tmp_path), "marker_segmenter")
    loaded = load_params(params, str(tmp_path), "marker_segmenter")
    out0 = model.apply(params, pts)
    out1 = model.apply(loaded, pts)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1))


def test_sdf_roundtrip(body):
    from uuo_mocap_tpu.models.sdf import SDF, build_sdf_grid

    p2bc = Pos2BC(num_vertices=body.num_vertices)
    pdiff = PosDiff()
    sdf = SDF(
        body,
        pos2bc_params=p2bc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3))),
        pos_diff_params=pdiff.init(jax.random.PRNGKey(1), jnp.zeros((1, 3))),
    )
    pts = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32) * 0.3)
    oh = sdf.points_to_barycentric_one_hot(pts)
    assert oh.shape == (5, body.num_vertices)
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1.0, atol=1e-4)
    back = sdf.barycentric_one_hot_to_points(oh)
    assert back.shape == (5, 3)

    grid = build_sdf_grid(body, resolution=(8, 8, 4))
    assert grid["sdf"].shape == (8, 8, 4)
    assert np.isfinite(grid["sdf"]).all()
