"""Batched reprojection + network segmentation in the multi-sequence sweep
(VERDICT r2 items 5-6): configs that previously raised NotImplementedError
under --batch now solve, with parity against the sequential path.

Both paths share the loss/optimizer programs, so the asserts pin the
invariants that survive mid-descent float drift (the batch-parity test's
protocol): comparable accuracy vs the generating ground truth and matching
stage decisions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver
from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap, prepare_sequence


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def _mpjpe_mm(body, a, b):
    oa = lbs_forward(
        body, jnp.asarray(a["pose_body"]), jnp.asarray(a["betas"]),
        jnp.asarray(a["root_orient"]), jnp.asarray(a["trans"]),
    )
    ob = lbs_forward(
        body, jnp.asarray(b["pose_body"]), jnp.asarray(b["betas"]),
        jnp.asarray(b["root_orient"]), jnp.asarray(b["trans"]),
    )
    return float(jnp.mean(jnp.linalg.norm(
        oa["joints"][:, :22] - ob["joints"][:, :22], axis=-1
    ))) * 1e3


def _gt_dict(gt, F):
    return {
        "pose_body": gt.pose_body,
        "betas": jnp.broadcast_to(gt.betas, (F, 10)),
        "root_orient": gt.root_orient,
        "trans": gt.trans,
    }


def _make_seqs(body, Q, F, M, with_camera=False):
    seqs = []
    for q in range(Q):
        gt = random_pose_sequence(F, seed=400 + q, yaw=0.2 * q)
        mk = generate_markers(body, gt, num_markers=M, seed=500 + q)
        prior = perturb_params(gt, seed=600 + q, pose_noise=0.03, trans_noise=0.05)
        img = ImgSmpl.from_params(prior)
        if with_camera:
            img.camera_bbox = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (F, 1))
            img.center = np.tile(np.array([320.0, 240.0], np.float32), (F, 1))
            img.scale = np.full((F, 1), 200.0, np.float32)
            img.size = np.tile(np.array([480.0, 640.0], np.float32), (F, 1))
        seqs.append((gt, img, ArrayMarkers(np.asarray(mk.points))))
    return seqs


@pytest.mark.slow
def test_batched_reprojection_parity(body):
    """reprojection_part-enabled config solves under the batched sweep
    (reference ``multimodal.py:253-335`` + ``hmr_utils.py:170-425``)."""
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 1
    cfg["stages"]["reprojection_part"]["num_iters"] = 8
    cfg["stages"]["reprojection_part"]["num_angles"] = 2
    cfg["stages"]["part"]["num_iters"] = 30
    cfg["stages"]["chamfer"]["num_iters"] = 30
    cfg["stages"]["marker"]["num_iters"] = 30

    Q, F, M = 2, 10, 16
    seqs = _make_seqs(body, Q, F, M, with_camera=True)

    seq_results = [
        multimodal_video_mocap(ims, mks, cfg, body, frame_bucket=None)
        for _, ims, mks in seqs
    ]
    preps = [prepare_sequence(ims, mks, frame_bucket=None) for _, ims, mks in seqs]
    assert all(p.has_camera for p in preps)
    out = MultiSequenceSolver(body, cfg).solve_prepared(preps)

    for q in range(Q):
        gt, _, _ = seqs[q]
        e_s = _mpjpe_mm(body, _gt_dict(gt, F), seq_results[q])
        e_b = _mpjpe_mm(body, _gt_dict(gt, F), out["results"][q])
        # both descents start from the same reprojection-aligned seeds; at
        # truncated iters allow mm-scale float drift between the programs
        assert abs(e_s - e_b) < max(10.0, 0.5 * e_s), (q, e_s, e_b)


def test_batched_reprojection_requires_camera(body):
    cfg = load_config("configs/video_mocap.yaml")
    cfg["stages"]["reprojection_part"]["num_iters"] = 5
    cfg["stages"]["reprojection_part"]["num_angles"] = 2
    seqs = _make_seqs(body, 1, 8, 12, with_camera=False)
    preps = [prepare_sequence(ims, mks, frame_bucket=None) for _, ims, mks in seqs]
    with pytest.raises(ValueError, match="camera"):
        MultiSequenceSolver(body, cfg).solve_prepared(preps)


@pytest.mark.slow
def test_batched_network_mode_parity(body, tmp_path_factory):
    """part.mode=network solves under the batched sweep (reference
    ``markers_utils.py:34-76``): per-sequence segmenter inference is
    host-side, feeding the same lane pipeline."""
    from uuo_mocap_tpu.models import train as T
    from uuo_mocap_tpu.models.checkpoints import save_params

    ckpt_dir = str(tmp_path_factory.mktemp("ckpts"))
    params, _ = T.train_marker_segmenter(body, steps=30, batch=4, num_markers=20, seed=2,
                                        pool_seqs=16, verts_per_seq=128)
    save_params(params, ckpt_dir, "marker_segmenter")

    cfg = load_config("configs/video_mocap.yaml")
    cfg["checkpoints_dir"] = ckpt_dir
    cfg["num_root_orient_angles"] = 1
    cfg["stages"]["part"]["mode"] = "network"
    cfg["stages"]["part"]["num_iters"] = 20
    cfg["stages"]["part"]["similarity_threshold"] = 0.4
    cfg["stages"]["chamfer"]["num_iters"] = 20
    cfg["stages"]["marker"]["num_iters"] = 20

    Q, F, M = 2, 16, 20
    seqs = _make_seqs(body, Q, F, M)
    seq_results = [
        multimodal_video_mocap(ims, mks, cfg, body, frame_bucket=None)
        for _, ims, mks in seqs
    ]
    preps = [prepare_sequence(ims, mks, frame_bucket=None) for _, ims, mks in seqs]
    out = MultiSequenceSolver(body, cfg).solve_prepared(preps)

    for q in range(Q):
        gt, _, _ = seqs[q]
        br = out["results"][q]
        assert br["markers_labels"].shape == (F, M)
        e_s = _mpjpe_mm(body, _gt_dict(gt, F), seq_results[q])
        e_b = _mpjpe_mm(body, _gt_dict(gt, F), br)
        assert abs(e_s - e_b) < max(10.0, 0.5 * e_s), (q, e_s, e_b)
