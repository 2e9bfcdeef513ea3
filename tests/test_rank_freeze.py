"""Rank-per-iteration chamfer (optimizer.rank_per_iteration): freeze the
nearest-vertex ranking across line-search trials, recomputing it at each
accepted L-BFGS iterate.  The fixed point satisfies the per-eval objective
(ranking is stationary at convergence), so the solved parameters must land
at the same optimum as the per-eval path within descent float noise."""
import numpy as np
import pytest
import jax.numpy as jnp

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline.stages import SolveStages


def _solve(body, cfg, gt, markers, prior, A=2):
    stages = SolveStages(body, cfg)
    F = gt.trans.shape[0]
    angles = np.arange(A) * 2 * np.pi / A
    root0 = jnp.stack([
        jnp.asarray(rot.rot_z(jnp.full((F, 1, 1), a))) @ prior.root_orient for a in angles
    ])
    params, res = stages.chamfer_stage_batched(
        jnp.asarray(markers), jnp.ones(markers.shape[:2]),
        prior.pose_body, prior.betas,
        prior.pose_body, prior.betas, root0, jnp.median(jnp.asarray(markers), axis=1),
        jnp.zeros(markers.shape[1], jnp.int64),
    )
    scores = stages.score_chamfer_lanes(
        jnp.broadcast_to(jnp.asarray(markers)[None], (A,) + markers.shape),
        jnp.ones((A,) + markers.shape[:2]), params)
    return params, res, np.asarray(scores)


@pytest.mark.slow  # ~50-60s on the 1-vCPU host: the fast tier must hold
# its 10-minute budget (pyproject); this path stays covered by the slow tier
def test_rank_freeze_reaches_same_optimum():
    body = synthetic_body_model()
    F, M = 12, 16
    gt = random_pose_sequence(F, seed=11)
    mk = generate_markers(body, gt, num_markers=M, seed=12)
    prior = perturb_params(gt, seed=13, pose_noise=0.03, trans_noise=0.05)
    markers = np.asarray(mk.points)

    cfg = load_config("configs/video_mocap.yaml")
    cfg["stages"]["chamfer"]["num_iters"] = 150

    cfg["optimizer"]["rank_per_iteration"] = False
    _, res_a, scores_a = _solve(body, cfg, gt, markers, prior)

    cfg["optimizer"]["rank_per_iteration"] = True
    _, res_b, scores_b = _solve(body, cfg, gt, markers, prior)

    # both descents land in the same chamfer basin.  At a truncated
    # iteration budget the trajectories differ (the frozen path's curvature
    # pairs are per-iteration consistent but cross-iteration stale), so the
    # assertion is basin-level: scores within a small absolute band of each
    # other (sub-0.1 mm^2; measured ~5e-5 vs ~8e-5 m^2 at 150 iters), not
    # bitwise equality
    np.testing.assert_allclose(scores_a, scores_b, atol=1e-4)
    assert (scores_b < 1e-3).all()  # genuinely converged, not diverged
    # the freeze pays one extra eval per iteration but line-search evals
    # stay bounded — counters must be sane
    assert (np.asarray(res_b.num_evals) > 0).all()
