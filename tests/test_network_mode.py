"""Network segmentation mode: train a small segmenter, save the checkpoint,
and solve a sequence with ``part.mode: network`` — the reference's neural
path end to end (it only ever ran from pretrained .pth files)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.models import train as T
from uuo_mocap_tpu.models.checkpoints import save_params
from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


@pytest.mark.slow
def test_network_mode_solve(tmp_path_factory, body):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpts"))
    params, hist = T.train_marker_segmenter(body, steps=40, batch=4, num_markers=24, seed=2,
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

    F = 16
    gt = random_pose_sequence(F, seed=21)
    mk = generate_markers(body, gt, num_markers=24, seed=22)
    prior = perturb_params(gt, seed=23, pose_noise=0.03, trans_noise=0.05)

    result = multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)), cfg, body, save_stages=True
    )
    assert "part" in result["stages"]
    assert result["markers_labels"].shape == (F, 24)
    assert np.isfinite(result["trans"]).all()


def test_network_mode_missing_checkpoint_errors(tmp_path, body):
    from uuo_mocap_tpu.pipeline.segmentation import segment_markers_network

    with pytest.raises(FileNotFoundError):
        segment_markers_network(np.zeros((40, 10, 3), np.float32), 30.0, checkpoint_root=str(tmp_path))


def test_new_losses():
    from uuo_mocap_tpu.solver import losses as L

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    target = jnp.asarray(np.eye(10, dtype=np.float32)[[0, 3, 5, 9]])
    val = float(L.soft_cross_entropy(logits, target))
    # equals mean cross entropy for one-hot targets up to entropy term (0)
    import jax

    ce = float(jnp.mean(-jnp.take_along_axis(jax.nn.log_softmax(logits, -1), jnp.asarray([[0], [3], [5], [9]]), 1)))
    np.testing.assert_allclose(val, ce, rtol=1e-5)

    pts = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0]]], np.float32))  # x-axis segment
    markers = jnp.asarray(np.array([[[0.5, 2.0, 0], [3.0, 0, 0]]], np.float32))
    loss = float(L.line_segment_loss(pts, markers))
    np.testing.assert_allclose(loss, 1.0, atol=1e-5)  # (2 + 0) / 2


def test_dict2device():
    from uuo_mocap_tpu.utils.tensor import dict2device

    out = dict2device({"a": np.ones(3), "b": {"c": np.zeros(2)}, "s": "keep"})
    assert hasattr(out["a"], "devices") or hasattr(out["a"], "device")
    assert out["s"] == "keep"
