"""End-to-end synthetic round-trip: generate markers from known SMPL ->
solve -> score against the generating parameters (the reference's own
integration-test pattern, SURVEY.md §4.3)."""
import copy

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap
from uuo_mocap_tpu.pipeline.stages import SmplParams

pytestmark = pytest.mark.slow  # full-solve e2e tier (see pyproject)


def fast_config():
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 2
    cfg["stages"]["part"]["num_iters"] = 40
    # aggressive subtree pruning: CPU tests don't need the full candidate set
    cfg["stages"]["part"]["similarity_threshold"] = 0.4
    cfg["stages"]["chamfer"]["num_iters"] = 60
    cfg["stages"]["marker"]["num_iters"] = 60
    return cfg


@pytest.fixture(scope="module")
def model():
    return synthetic_body_model()


def mpjpe_mm(model, solved, gt: SmplParams) -> float:
    F = gt.trans.shape[0]
    out_gt = lbs_forward(model, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
    out_s = lbs_forward(
        model,
        jnp.asarray(solved["pose_body"]),
        jnp.asarray(solved["betas"]),
        jnp.asarray(solved["root_orient"]),
        jnp.asarray(solved["trans"]),
    )
    err = jnp.linalg.norm(out_s["joints"][:, :22] - out_gt["joints"][:, :22], axis=-1)
    return float(jnp.mean(err)) * 1000.0


def test_full_solve_recovers_ground_truth(model):
    F = 40
    gt = random_pose_sequence(F, seed=3, yaw=0.8, travel=0.3)
    markers = generate_markers(model, gt, num_markers=30, seed=4, occlusion_rate=0.05)
    prior = perturb_params(gt, seed=5, pose_noise=0.05, trans_noise=0.08, betas_noise=0.2)

    img_smpl = ImgSmpl.from_params(prior)
    mocap = ArrayMarkers(np.asarray(markers.points), freq=30.0)

    result = multimodal_video_mocap(img_smpl, mocap, fast_config(), model, save_stages=True)

    err = mpjpe_mm(model, result, gt)
    assert err < 40.0, f"MPJPE {err:.1f} mm"
    # output schema parity (reference multimodal.py:679-710)
    for key in ("trans", "root_orient", "pose_body", "betas", "mocap_frame_rate",
                "mocap_markers", "markers_labels", "chain"):
        assert key in result, key
    assert result["pose_body"].shape == (F, 23, 3, 3)
    assert result["betas"].shape == (F, 10)
    for stage in ("part", "chamfer", "marker", "marker_final"):
        assert stage in result["stages"], stage


def test_solve_without_part_fit(model):
    cfg = fast_config()
    cfg["find_best_part_fits"] = False
    F = 30
    gt = random_pose_sequence(F, seed=7, yaw=0.0, travel=0.2)
    markers = generate_markers(model, gt, num_markers=25, seed=8)
    prior = perturb_params(gt, seed=9, pose_noise=0.03, trans_noise=0.05, betas_noise=0.1)
    result = multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(markers.points)), cfg, model
    )
    err = mpjpe_mm(model, result, gt)
    assert err < 40.0, f"MPJPE {err:.1f} mm"
    assert "chain" not in result


def test_hmr_part_config_skips_late_stages(model):
    cfg = load_config("configs/hmr_part.yaml")
    cfg["stages"]["part"]["num_iters"] = 30
    cfg["stages"]["part"]["similarity_threshold"] = 0.4
    assert cfg["stages"]["chamfer"]["num_iters"] == 0
    assert cfg["stages"]["marker"]["num_iters"] == 0
    F = 20
    gt = random_pose_sequence(F, seed=11)
    markers = generate_markers(model, gt, num_markers=20, seed=12)
    prior = perturb_params(gt, seed=13)
    result = multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(markers.points)), cfg, model, save_stages=True
    )
    assert "part" in result["stages"]
    assert "chamfer" not in result["stages"]
    assert "marker" not in result["stages"]


def test_config_inheritance():
    cfg = load_config("configs/mht_rotation.yaml")
    assert cfg["num_root_orient_angles"] == 1
    assert cfg["stages"]["chamfer"]["num_iters"] == 10000  # inherited
    assert cfg["name"] == "video_mocap_mht_rotation"


def test_c3d_roundtrip(tmp_path):
    from uuo_mocap_tpu.data.c3d import read_c3d, write_c3d
    from uuo_mocap_tpu.data.markers import Markers

    rng = np.random.RandomState(0)
    pts = rng.randn(50, 12, 3).astype(np.float32)
    path = str(tmp_path / "test.c3d")
    write_c3d(path, pts, rate=120.0, units="m", labels=[f"MK{i}" for i in range(12)])

    data = read_c3d(path)
    assert data["rate"] == 120.0
    assert data["units"] == "m"
    assert data["labels"][:2] == ["MK0", "MK1"]
    np.testing.assert_allclose(data["points"][:, :, :3], pts, atol=1e-6)

    m = Markers(path)
    assert m.get_frequency() == 120.0
    assert m.get_num_markers() == 12
    np.testing.assert_allclose(m.get_points(), pts, atol=1e-6)


def test_img_smpl_gap_fill():
    F = 10
    gt = random_pose_sequence(F, seed=2)
    img = ImgSmpl.from_params(gt)
    # knock out frames 3..5 and re-run gap fill
    mask = np.ones(F, bool)
    mask[3:6] = False
    trans = img.trans.copy()
    trans[3:6] = 99.0
    t, r, hr, p, b = ImgSmpl._gap_fill(
        trans, img.root_orient.copy(), img.hmr_root_orient.copy(),
        img.pose_body.copy(), img.betas.copy(), mask,
    )
    # filled frames interpolate between frame 2 and 6, so stay in range
    assert np.abs(t[3:6]).max() < np.abs(img.trans).max() + 1.0
    # rotations stay valid
    RtR = np.einsum("faij,fakj->faik", r, r)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)
