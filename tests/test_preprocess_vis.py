"""Preprocessing pipeline + visualization smoke tests."""
import os

import numpy as np
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.c3d import read_c3d, write_c3d


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_preprocess_c3d_pipeline(tmp_path):
    from uuo_mocap_tpu.data.preprocess import preprocess_c3d_file, slice_gt_to_windows

    rng = np.random.RandomState(0)
    F = 1200  # 10 s at 120 Hz
    labels = ["S1:LSHO", "S1:LELB", "S1:RKNE", "S1:RANK", "S1:C7", "S2:LSHO", "BACKPACK1"]
    pts = rng.randn(F, len(labels), 3).astype(np.float32) * 1000  # mm
    src = str(tmp_path / "raw.c3d")
    write_c3d(src, pts, rate=120.0, units="mm", labels=labels)

    written = preprocess_c3d_file(
        src, str(tmp_path / "out"), "seq", target_freq=30.0, window_seconds=2.0,
        subject_prefix="S1", remove_substrings=("BACKPACK",), parts=["left_arm"],
    )
    # 10 s -> 300 frames at 30 Hz -> 5 windows of 2 s, x (full + left_arm part)
    full = [w for w in written if "/mocap/" in w]
    part = [w for w in written if "mocap_parts___left_arm" in w]
    assert len(full) == 5 and len(part) == 5
    d = read_c3d(full[0])
    assert d["points"].shape[0] == 60  # 2 s at 30 Hz
    assert d["points"].shape[1] == 5  # S1 markers minus backpack
    assert sorted(d["labels"]) == sorted(["LSHO", "LELB", "RKNE", "RANK", "C7"])
    dp = read_c3d(part[0])
    assert dp["points"].shape[1] == 2  # LSHO, LELB
    assert os.path.exists(str(tmp_path / "out" / "settings.json"))

    # GT slicing by matching windows
    gt = str(tmp_path / "gt.npz")
    np.savez(gt, poses=rng.randn(300, 72), trans=rng.randn(300, 3), betas=rng.randn(10),
             mocap_frame_rate=30.0)
    sliced = slice_gt_to_windows(gt, str(tmp_path / "gt_out"), "seq", window_seconds=2.0)
    assert len(sliced) == 5
    assert os.path.basename(sliced[0]) == "seq_00000000_stageii.npz"
    s0 = np.load(sliced[0])
    assert s0["poses"].shape[0] == 60


def test_downsample_and_window_utils():
    from uuo_mocap_tpu.data.preprocess import get_downsampled_indices, window_sequence

    idx = get_downsampled_indices(120, 120.0, 30.0)
    assert len(idx) == 30
    assert idx[0] == 0 and idx[-1] <= 119

    pts = np.arange(10 * 2 * 3, dtype=np.float32).reshape(10, 2, 3)
    wins = window_sequence(pts, freq=1.0, window_seconds=4.0)
    assert len(wins) == 3
    assert wins[0].shape == (4, 2, 3)
    # last window padded by repetition
    np.testing.assert_array_equal(wins[2][-1], pts[-1])


def test_renderer_writes_frames(tmp_path, body):
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    verts = np.asarray(body.v_template)
    markers = verts[::400] + 0.01

    scene = VideoMocapScene()

    def render_frame(s, frame):
        s.add_mesh(verts, body.faces)
        s.add_markers(markers, labels=np.arange(markers.shape[0]) % 24)

    out_dir = str(tmp_path / "frames")
    path = VideoMocapRenderer(scene, render_frame, 2, out_dir).run()
    assert os.path.exists(os.path.join(path, "000000.png"))
    assert os.path.exists(os.path.join(path, "000001.png"))


def test_visualize_smpl_cli(tmp_path, body):
    import jax.numpy as jnp

    from uuo_mocap_tpu.data.synthetic import random_pose_sequence
    from uuo_mocap_tpu.ops import rotations as rot
    from uuo_mocap_tpu.vis.visualize_smpl import visualize_smpl

    gt = random_pose_sequence(3, seed=1)
    poses_mat = jnp.concatenate([gt.root_orient, gt.pose_body], axis=1)
    poses_aa = np.asarray(rot.matrix_to_axis_angle(poses_mat)).reshape(3, -1)
    npz = str(tmp_path / "a_stageii.npz")
    np.savez(npz, poses=poses_aa, betas=np.asarray(gt.betas)[0], trans=np.asarray(gt.trans),
             mocap_frame_rate=30.0)

    out = visualize_smpl([npz], body, video_path=str(tmp_path / "out.gif"))
    assert os.path.exists(out)


def test_plots(tmp_path):
    from uuo_mocap_tpu.vis.plots import (
        plot_2d_joints,
        plot_confusion_matrix,
        plot_error_heatmap,
        plot_label_histogram,
        plot_root_trajectories,
    )

    rng = np.random.RandomState(0)
    assert os.path.exists(plot_root_trajectories(str(tmp_path / "r.png"), [rng.randn(20, 3)]))
    assert os.path.exists(plot_2d_joints(str(tmp_path / "j.png"), rng.rand(2, 45, 2)))
    assert os.path.exists(plot_error_heatmap(str(tmp_path / "h.png"), rng.rand(30, 22)))
    assert os.path.exists(plot_label_histogram(str(tmp_path / "l.png"), rng.randint(0, 24, 50)))
    assert os.path.exists(
        plot_confusion_matrix(str(tmp_path / "c.png"), rng.randint(0, 24, 100), rng.randint(0, 24, 100))
    )


def test_ply_export(tmp_path, body):
    from uuo_mocap_tpu.cli.export_marker_layout import write_ply

    path = write_ply(
        str(tmp_path / "m.ply"), np.asarray(body.v_template)[:10],
        np.array([[0, 1, 2], [3, 4, 5]]), np.random.rand(10, 3),
    )
    text = open(path).read()
    assert text.startswith("ply")
    assert "element vertex 10" in text
    assert "element face 2" in text


def test_filter_cli(tmp_path):
    from uuo_mocap_tpu.cli.filter import main as filter_main

    rng = np.random.RandomState(0)
    src = str(tmp_path / "in.npz")
    np.savez(src, poses=rng.randn(30, 72), trans=rng.randn(30, 3), betas=rng.randn(10),
             mocap_frame_rate=30.0)
    dst = str(tmp_path / "out.npz")
    filter_main(["--input", src, "--output", dst])
    out = np.load(dst)
    assert out["poses"].shape == (30, 72)
    # smoothing reduces frame-to-frame jitter
    raw = np.load(src)["poses"]
    assert np.abs(np.diff(out["poses"], axis=0)).mean() < np.abs(np.diff(raw, axis=0)).mean()
