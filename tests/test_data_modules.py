"""Tests for marker layouts, noise models, synthetic containers, AMASS
pipeline, export tool, and the comparisons/ablations harnesses."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_marker_layout_resolution(body):
    from uuo_mocap_tpu.data.marker_layout import (
        MARKER_LAYOUTS,
        compute_marker_labels_from_layout,
        compute_markers_from_layout,
        resolve_layout_vertex_ids,
    )

    names = MARKER_LAYOUTS["cmu_41"]
    assert len(names) == 39  # the reference's cmu_41 list
    vids = resolve_layout_vertex_ids("cmu_41", body)
    assert vids.shape == (39,)
    assert len(np.unique(vids)) > 30  # mostly distinct anchor vertices
    # explicit table path
    table = {n: int(i) for i, n in enumerate(names)}
    vids2 = resolve_layout_vertex_ids("cmu_41", body, table)
    np.testing.assert_array_equal(vids2, np.arange(39))

    verts = jnp.asarray(np.asarray(body.v_template))[None, None]  # [1, 1, V, 3]
    out = compute_markers_from_layout(verts, body.faces, vids)
    assert out["marker_pos"].shape == (1, 1, 39, 3)
    # offset ~9.5 mm from the anchor vertex
    d = np.linalg.norm(np.asarray(out["marker_pos"][0, 0]) - np.asarray(body.v_template)[vids], axis=-1)
    np.testing.assert_allclose(d, 0.0095, atol=1e-4)

    labels = compute_marker_labels_from_layout(vids, body.lbs_weights)
    assert labels.shape == (39,)


def test_markers_noise_models():
    from uuo_mocap_tpu.data.markers_noise import (
        markers_swap,
        markers_tracking_loss,
        randomly_drop_markers,
    )

    rng = np.random.RandomState(0)
    pts = rng.randn(100, 10, 3).astype(np.float32)
    swapped = markers_swap(pts, swap_probability=0.5, distance_threshold=10.0, rng=np.random.RandomState(1))
    assert swapped.shape == pts.shape
    assert not np.allclose(swapped, pts)  # some swaps happened

    lost = markers_tracking_loss(pts, probability=1.0, max_length=10, rng=np.random.RandomState(2))
    zero_rows = (np.abs(lost).sum(-1) == 0).sum()
    assert zero_rows > 0

    pts_up = pts.copy()
    pts_up[..., 2] += 2.0  # hold markers above the floor
    dropped = randomly_drop_markers(pts_up, frequency=30.0, num_drop=2, rng=np.random.RandomState(3))
    assert dropped.shape == pts.shape
    # dropped markers end up near the floor at the end
    moved = np.where(np.abs(dropped[-1] - pts_up[-1]).sum(-1) > 1e-6)[0]
    assert len(moved) >= 1
    assert dropped[-1, moved, 2].min() < 0.5


def test_markers_synthetic_containers(body):
    from uuo_mocap_tpu.data.markers_synthetic import MarkersSynthetic, MarkersSyntheticStructured

    mk = MarkersSynthetic(body, num_frames=20, num_markers=15, seed=1)
    assert mk.get_points().shape == (20, 15, 3)
    assert mk.get_frequency() == 30.0

    mks = MarkersSyntheticStructured(body, num_frames=10, seed=2)
    assert mks.get_points().shape[0] == 10
    assert mks.get_points().shape[1] == 39

    part = MarkersSyntheticStructured(body, num_frames=10, seed=3, parts=["left_arm"])
    assert part.get_points().shape[1] < 39  # filtered to a limb


def test_dataset_mocap_procedural(body):
    from uuo_mocap_tpu.data.amass import DatasetMocap, DatasetSMPLHMotion

    ds = DatasetMocap(body, sequence_length=8, num_markers=12, seed=0)
    sample = ds[0]
    assert sample["markers"].shape == (8, 12, 3)
    assert sample["marker_labels"].shape == (12,)
    assert sample["joints"].shape == (8, 22, 3)

    motion = DatasetSMPLHMotion(body, sequence_length=8)
    m = motion[0]
    assert m["pose_body"].shape == (8, 23, 3, 3)


def test_preprocess_amass_npz(tmp_path, body):
    from uuo_mocap_tpu.data.amass import preprocess_amass_npz

    rng = np.random.RandomState(0)
    raw = str(tmp_path / "raw.npz")
    np.savez(
        raw,
        poses=rng.randn(240, 156).astype(np.float64) * 0.1,
        trans=rng.randn(240, 3),
        betas=rng.randn(16),
        mocap_framerate=120.0,
        gender="male",
    )
    dst = preprocess_amass_npz(raw, str(tmp_path / "proc.npz"), body=body)
    out = np.load(dst, allow_pickle=True)
    assert out["poses"].shape[0] == 60  # 240 @ 120Hz -> 30Hz
    assert out["poses"].dtype == np.float32
    assert out["foot_contacts"].shape == (60, 2)
    assert float(out["mocap_frame_rate"]) == 30.0


@pytest.mark.slow  # ~50-60s on the 1-vCPU host: the fast tier must hold
# its 10-minute budget (pyproject); this path stays covered by the slow tier
def test_export_tool_and_comparisons_roundtrip(tmp_path, body):
    """export synthetic c3d + GT -> evaluate GT against itself (moshpp
    method) -> ~zero error; the full harness loop."""
    from uuo_mocap_tpu.cli.export_synthetic_c3d import main as export_main
    from uuo_mocap_tpu.eval.comparisons import run_comparisons

    export_main([
        "--input_dir", str(tmp_path), "--dataset", "synth", "--subjects", "s1",
        "--sequences", "walk_000", "--num_markers", "20", "--num_frames", "12", "--seed", "5",
    ])
    c3d_path = tmp_path / "synth" / "mocap_synthetic___5_20" / "s1" / "walk_000.c3d"
    assert c3d_path.exists()
    gt_path = tmp_path / "synth" / "smpl" / "s1" / "walk_000_stageii.npz"
    assert gt_path.exists()

    # the synthetic variant routes markers through mocap_synthetic___5_20
    # (reference comparisons.py:322-326); m2s comes from the real c3d — the
    # harness never fabricates markers
    stats = run_comparisons(body, str(tmp_path), "synth", methods=["moshpp"], synthetic="5_20")
    assert "moshpp" in stats and stats["moshpp"]
    # GT vs itself: joint errors ~0 (m2s is nonzero: markers sit 9.5mm off the surface)
    assert stats["moshpp"]["mpjpe"]["mean"] < 1e-2
    assert stats["moshpp"]["v2v"]["mean"] < 1e-2
    assert stats["moshpp"]["m2s"]["mean"] < 20.0
    stats_root = tmp_path / "synth" / "results" / "stats" / "synth" / "synthetic_5_20"
    assert (stats_root / "moshpp.yaml").exists() and (stats_root / "moshpp.csv").exists()


def test_stage_ablations_harness(tmp_path, body):
    """Fabricate per-stage outputs and score them."""
    from uuo_mocap_tpu.eval.ablations import run_stage_ablations
    from uuo_mocap_tpu.data.synthetic import random_pose_sequence
    from uuo_mocap_tpu.ops import rotations as rot

    gt = random_pose_sequence(8, seed=9)
    F = 8
    poses_mat = jnp.concatenate([gt.root_orient, gt.pose_body], axis=1)
    poses_aa = np.asarray(rot.matrix_to_axis_angle(poses_mat)).reshape(F, -1)

    gt_dir = tmp_path / "ds" / "smpl" / "s1"
    res_dir = tmp_path / "ds" / "results" / "video_mocap" / "s1"
    gt_dir.mkdir(parents=True)
    res_dir.mkdir(parents=True)
    common = dict(poses=poses_aa, betas=np.asarray(gt.betas)[0], trans=np.asarray(gt.trans), mocap_frame_rate=30.0)
    np.savez(gt_dir / "seq_stageii.npz", **common)
    np.savez(res_dir / "seq_stageii.marker.npz", **common)  # perfect "marker" stage

    stats = run_stage_ablations(body, str(tmp_path), "ds", "video_mocap", stages=["marker"])
    assert stats["marker"]["mpjpe"]["mean"] < 1e-2
