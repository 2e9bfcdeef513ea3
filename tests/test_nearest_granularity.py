"""compute_nearest_points granularity variants (full / marker / part,
use_mean / barycentric / vertex paths)."""
import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.synthetic import generate_markers, random_pose_sequence
from uuo_mocap_tpu.pipeline.stages import SmplParams, SolveStages


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


@pytest.fixture(scope="module")
def problem(body):
    F = 8
    gt = random_pose_sequence(F, seed=31)
    mk = generate_markers(body, gt, num_markers=18, seed=32, surface_offset=0.0)
    labels = jnp.asarray(np.asarray(jnp.argmax(body.lbs_weights, axis=-1))[mk.vertex_ids])
    return gt, mk, labels


def _cfg(granularity, use_mean, use_barycentric):
    cfg = load_config("configs/video_mocap.yaml")
    cfg["stages"]["segment"]["granularity"] = granularity
    cfg["stages"]["compute_locations"]["use_mean"] = use_mean
    cfg["stages"]["compute_locations"]["use_barycentric"] = use_barycentric
    return cfg


@pytest.mark.parametrize(
    "granularity,use_mean,use_barycentric",
    [
        ("full", True, False),
        ("full", False, False),
        ("full", False, True),
        ("marker", False, False),
        ("part", False, True),
    ],
)
def test_nearest_points_recovers_generating_vertices(body, problem, granularity, use_mean, use_barycentric):
    """Markers generated AT vertices (zero offset) + ground-truth pose:
    the recovered attachment must reconstruct the marker positions."""
    gt, mk, labels = problem
    F = gt.trans.shape[0]
    stages = SolveStages(body, _cfg(granularity, use_mean, use_barycentric))
    att = stages.nearest_points(
        mk.points, SmplParams(gt.pose_body, gt.betas, gt.root_orient, gt.trans),
        jnp.ones(F), labels if granularity == "part" else None,
    )
    assert att.vertex_ids.shape == (18, 3)
    np.testing.assert_allclose(np.asarray(att.weights.sum(-1)), 1.0, atol=1e-4)

    out = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
    from uuo_mocap_tpu.pipeline.stages import virtual_markers_from_attachment

    virtual = np.asarray(virtual_markers_from_attachment(out["vertices"], att))
    err = np.linalg.norm(virtual - np.asarray(mk.points), axis=-1).mean()
    assert err < 0.02, f"{granularity}/{use_mean}/{use_barycentric}: {err * 1000:.1f} mm"
