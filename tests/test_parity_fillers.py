"""Tests for the remaining parity components: SMPLH datasets, paper plots,
reprojection stage + overlays, bmlmovi conversion, random seed util."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_smplh_dataset_samples(body):
    from uuo_mocap_tpu.data.smplh_datasets import SMPLHDataset

    ds = SMPLHDataset(body, seed=0)
    out = ds.sample(16)
    assert out["pos"].shape == (16, 3)
    assert out["barycentric_one_hot"].shape == (16, body.num_vertices)
    np.testing.assert_allclose(out["barycentric_one_hot"].sum(-1), 1.0, atol=1e-5)
    # samples lie on the surface: one-hot reconstructs the position
    recon = out["barycentric_one_hot"] @ np.asarray(body.v_template)
    np.testing.assert_allclose(recon, out["pos"], atol=1e-4)

    # part-restricted sampling
    ds_arm = SMPLHDataset(body, parts=[18, 20, 22], seed=0)
    assert len(ds_arm.face_ids) < len(ds.face_ids)


def test_smplh_diff_dataset(body):
    from uuo_mocap_tpu.data.smplh_datasets import SMPLHDiffDataset

    ds = SMPLHDiffDataset(body, seed=0)
    out = ds.sample(8)
    assert out["pos"].shape == (8, 3)
    np.testing.assert_allclose(out["pos"] + out["pos_diff"], out["closest"], atol=1e-5)
    # displaced points land (approximately) on the surface
    from uuo_mocap_tpu.ops.point_mesh import marker_to_surface_distance

    d = float(
        marker_to_surface_distance(
            jnp.asarray(out["closest"])[None], jnp.asarray(body.v_template)[None], jnp.asarray(body.faces)
        )
    )
    assert d < 1e-3


def test_reprojection_stage_and_overlays(tmp_path, body):
    from uuo_mocap_tpu.data.config import load_config
    from uuo_mocap_tpu.data.img_smpl import ImgSmpl
    from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
    from uuo_mocap_tpu.ops.geometry import get_marker_mask
    from uuo_mocap_tpu.pipeline.reprojection import ReprojectionStage
    from uuo_mocap_tpu.vis.visualize_reprojection import plot_reprojection_overlays

    cfg = load_config("configs/video_mocap.yaml")
    cfg["stages"]["reprojection_part"]["num_iters"] = 10
    F, A = 10, 2
    gt = random_pose_sequence(F, seed=3)
    mk = generate_markers(body, gt, num_markers=20, seed=4)
    prior = perturb_params(gt, seed=5)
    img = ImgSmpl.from_params(prior)
    img.camera_bbox = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (F, 1))
    img.center = np.tile(np.array([320.0, 240.0], np.float32), (F, 1))
    img.scale = np.full((F, 1), 200.0, np.float32)
    img.size = np.tile(np.array([480.0, 640.0], np.float32), (F, 1))

    stage = ReprojectionStage(body, cfg, "reprojection_part")
    angles = jnp.asarray([0.0, np.pi], jnp.float32)
    out = stage(
        angles, mk.points, get_marker_mask(mk.points),
        jnp.asarray(img.pose_body), jnp.asarray(img.betas[:1]),
        jnp.asarray(img.betas), jnp.asarray(img.hmr_root_orient), jnp.asarray(img.trans),
        jnp.asarray(img.camera_bbox), jnp.asarray(img.center),
        jnp.asarray(img.size), jnp.asarray(img.scale), jnp.ones(F),
    )
    assert out["root_orient"].shape == (A, F, 1, 3, 3)
    assert np.isfinite(np.asarray(out["metrics"]["reproject"])).all()
    assert np.isfinite(np.asarray(out["metrics"]["chamfer"])).all()

    paths = plot_reprojection_overlays(str(tmp_path), out, angles)
    assert all(os.path.exists(p) for p in paths)


def test_paper_part_error_plot(tmp_path):
    from uuo_mocap_tpu.vis.paper import plot_part_errors

    stats = {
        "ours": {"left_arm__mpjpe": {"mean": 12.0}, "right_leg__mpjpe": {"mean": 20.0}},
        "hmr": {"left_arm__mpjpe": {"mean": 30.0}, "right_leg__mpjpe": {"mean": 25.0}},
    }
    path = plot_part_errors(str(tmp_path / "parts.png"), stats, parts=["left_arm", "right_leg"])
    assert os.path.exists(path)


def test_bmlmovi_mat_conversion(tmp_path):
    from scipy.io import savemat

    from uuo_mocap_tpu.cli.preprocess_datasets import convert_bmlmovi_mat
    from uuo_mocap_tpu.data.c3d import read_c3d

    rng = np.random.RandomState(0)
    markers = rng.randn(50, 12, 3).astype(np.float64) * 100
    savemat(str(tmp_path / "s.mat"), {"move": {"markerLocation": markers}})
    out = convert_bmlmovi_mat(str(tmp_path / "s.mat"), str(tmp_path / "s.c3d"))
    d = read_c3d(out)
    assert d["points"].shape[:2] == (50, 12)


def test_set_random_seed():
    from uuo_mocap_tpu.utils.random import set_random_seed

    key = set_random_seed(42)
    a = np.random.rand(3)
    set_random_seed(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert key.shape == (2,)
