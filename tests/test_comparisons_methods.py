"""Comparisons-harness method conventions + gendered inference
(reference ``evaluation/comparisons.py:303-587``; VERDICT r1 item 4)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.synthetic import random_pose_sequence
from uuo_mocap_tpu.eval.comparisons import (
    default_model_provider,
    evaluate_pair,
    load_smpl_npz,
    resolve_pred,
    run_comparisons,
)
from uuo_mocap_tpu.ops import rotations as rot


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def _write_stageii(path, gt, gender="neutral", markers=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    F = gt.trans.shape[0]
    poses_mat = jnp.concatenate([gt.root_orient, gt.pose_body], axis=1)
    poses_aa = np.asarray(rot.matrix_to_axis_angle(poses_mat)).reshape(F, -1)
    out = dict(
        poses=poses_aa, betas=np.asarray(gt.betas)[0], trans=np.asarray(gt.trans),
        mocap_frame_rate=30.0, gender=gender,
    )
    if markers is not None:
        out["mocap_markers"] = markers
    np.savez(path, **out)


def _fake_phalp(gt):
    """Minimal 4D-Humans demo pkl structure for the hmr loader."""
    F = gt.trans.shape[0]
    data = {}
    from uuo_mocap_tpu.data.img_smpl import CORRECTION_MATRIX

    for f in range(F):
        # store the camera-frame root that ImgSmpl will rotate back
        go = CORRECTION_MATRIX.T @ np.asarray(gt.root_orient[f, 0])
        j3d = np.zeros((45, 3), np.float32)
        data[f"frame_{f:04d}.jpg"] = {
            "tracked_ids": [0],
            "smpl": [{
                "global_orient": go.reshape(1, 3, 3),
                "body_pose": np.asarray(gt.pose_body[f]),
                "betas": np.asarray(gt.betas)[0],
            }],
            "3d_joints": [j3d],
            "2d_joints": [np.zeros(90, np.float32)],
            "camera_bbox": [np.zeros(3, np.float32)],
            "center": [np.zeros(2, np.float32)],
            "scale": [np.ones(1, np.float32)],
            "size": [np.asarray([256, 256], np.float32)],
        }
    return data


def test_method_dir_conventions(tmp_path, body):
    """Every method kind resolves its reference directory convention."""
    import joblib

    base = str(tmp_path / "ds")
    gt = random_pose_sequence(6, seed=1)
    _write_stageii(os.path.join(base, "smpl", "s1", "seq_stageii.npz"), gt)
    for m in ("vposer", "humor", "vposer_vid", "humor_vid"):
        _write_stageii(os.path.join(base, "comparisons", m, "s1", "seq_stageii.npz"), gt)
    _write_stageii(os.path.join(base, "results", "hmr", "s1", "seq_stageii.npz"), gt)
    _write_stageii(os.path.join(base, "comparisons", "soma", "smpl", "s1", "seq_stageii.npz"), gt)
    _write_stageii(os.path.join(base, "results", "video_mocap", "s1", "seq_stageii.npz"), gt)
    pkl_dir = os.path.join(base, "comparisons", "4d_humans", "s1", "seq.cam0", "results")
    os.makedirs(pkl_dir, exist_ok=True)
    joblib.dump(_fake_phalp(gt), os.path.join(pkl_dir, "demo_seq.pkl"))

    for method in ("moshpp", "vposer", "humor", "vposer_vid", "humor_vid",
                   "hmr", "hmr_rr", "soma", "video_mocap"):
        pred = resolve_pred(base, method, "s1", "seq", "cam0", None, None, 30.0)
        assert pred is not None, f"method {method} did not resolve"
        assert pred["pose_aa"].shape == (6, 24, 3)
    # absent method -> None, unknown -> error
    assert resolve_pred(base, "soma", "s1", "other", "cam0", None, None, 30.0) is None
    with pytest.raises(ValueError):
        resolve_pred(base, "nonsense", "s1", "seq", "cam0", None, None, 30.0)


def test_variant_subdirs(tmp_path, body):
    """--part / --synthetic route hmr_rr/soma/video_mocap through their
    variant subdirectories (reference comparisons.py:467-543)."""
    base = str(tmp_path / "ds")
    gt = random_pose_sequence(4, seed=2)
    _write_stageii(os.path.join(base, "results", "video_mocap", "s1", "arm", "seq_stageii.npz"), gt)
    _write_stageii(os.path.join(base, "results", "hmr", "s1", "synthetic_5_20", "seq_stageii.npz"), gt)
    assert resolve_pred(base, "video_mocap", "s1", "seq", None, "arm", None, 30.0) is not None
    assert resolve_pred(base, "video_mocap", "s1", "seq", None, None, None, 30.0) is None
    assert resolve_pred(base, "hmr_rr", "s1", "seq", None, None, "5_20", 30.0) is not None


def test_gendered_inference(tmp_path, body):
    """Each file evaluates through the SMPL of its own gender; same-gender
    GT-vs-GT gives ~zero joint error, and the gendered model is actually
    used (male != neutral on the synthetic family)."""
    provider = default_model_provider(str(tmp_path / "missing"))
    m_neutral = provider("neutral")
    m_male = provider("male")
    # the synthetic gendered templates differ — gendered eval is not a no-op
    assert not np.allclose(np.asarray(m_neutral.v_template), np.asarray(m_male.v_template))

    gt = random_pose_sequence(5, seed=3)
    path = str(tmp_path / "male_stageii.npz")
    _write_stageii(path, gt, gender="male")
    d = load_smpl_npz(path)
    assert d["gender"] == "male"
    metrics = evaluate_pair(dict(d), dict(d), provider, markers=None)
    assert metrics["mpjpe"] < 1e-2
    assert np.isnan(metrics["m2s"])  # no marker source -> NaN, not fabricated


def test_missing_markers_excluded_from_aggregates(tmp_path, body):
    """m2s is NaN (not fabricated) without a marker source and drops out of
    the YAML aggregation."""
    base = str(tmp_path / "ds")
    gt = random_pose_sequence(4, seed=4)
    _write_stageii(os.path.join(base, "smpl", "s1", "seq_stageii.npz"), gt)  # no markers
    stats = run_comparisons(body, str(tmp_path), "ds", methods=["moshpp"])
    assert stats["moshpp"]["mpjpe"]["mean"] < 1e-2
    assert "m2s" not in stats["moshpp"]
