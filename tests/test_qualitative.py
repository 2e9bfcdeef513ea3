"""Qualitative render harness: method-dir conventions + render output
(reference ``evaluation/qualitative.py``)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.synthetic import random_pose_sequence
from uuo_mocap_tpu.eval.qualitative import run_qualitative
from uuo_mocap_tpu.ops import rotations as rot


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def _write(path, gt, F):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    poses_aa = np.asarray(rot.matrix_to_axis_angle(
        jnp.concatenate([gt.root_orient, gt.pose_body], axis=1)
    )).reshape(F, -1)
    np.savez(path, poses=poses_aa, betas=np.asarray(gt.betas)[0],
             trans=np.asarray(gt.trans), mocap_frame_rate=30.0, gender="neutral",
             mocap_markers=np.random.RandomState(0).randn(F, 8, 3).astype(np.float32))


def test_qualitative_renders_methods(body, tmp_path):
    base = str(tmp_path / "ds")
    F = 5
    gt = random_pose_sequence(F, seed=1)
    _write(os.path.join(base, "smpl", "s1", "seq_stageii.npz"), gt, F)
    _write(os.path.join(base, "results", "video_mocap", "s1", "seq_stageii.npz"), gt, F)
    written = run_qualitative(body, str(tmp_path), "ds", ["moshpp", "video_mocap"], max_frames=3)
    assert len(written) == 2
    for w in written:
        assert os.path.exists(w) and w.endswith(".gif")
    # reference output layout: results/qual/<method>/<subject>/<seq>.<ext>
    assert os.path.exists(os.path.join(base, "results", "qual", "moshpp", "s1", "seq.gif"))


def test_qualitative_part_variant_layout(body, tmp_path):
    base = str(tmp_path / "ds")
    F = 4
    gt = random_pose_sequence(F, seed=2)
    _write(os.path.join(base, "smpl", "s1", "seq_stageii.npz"), gt, F)
    _write(os.path.join(base, "results", "video_mocap", "s1", "arm", "seq_stageii.npz"), gt, F)
    written = run_qualitative(
        body, str(tmp_path), "ds", ["video_mocap"], part="arm", max_frames=2
    )
    assert written
    assert os.path.exists(os.path.join(base, "results", "qual", "video_mocap", "s1", "arm", "seq.gif"))
