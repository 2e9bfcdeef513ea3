"""Multi-sequence sharded sweep: S sequences solve in one batched program
and each recovers its own ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.ops.geometry import get_marker_mask
from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver
from uuo_mocap_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow  # full-solve e2e tier (see pyproject)


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_multi_sequence_sweep(body):
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 2
    cfg["stages"]["chamfer"]["num_iters"] = 40
    cfg["stages"]["marker"]["num_iters"] = 40

    S, F, M = 4, 16, 20
    gts, mks, priors = [], [], []
    for s in range(S):
        gt = random_pose_sequence(F, seed=100 + s, yaw=0.3 * s)
        mk = generate_markers(body, gt, num_markers=M, seed=200 + s)
        priors.append(perturb_params(gt, seed=300 + s, pose_noise=0.03, trans_noise=0.05))
        gts.append(gt)
        mks.append(mk)

    markers = jnp.stack([m.points for m in mks])
    weights = get_marker_mask(markers)
    o_pose = jnp.stack([p.pose_body for p in priors])
    o_betas = jnp.stack([p.betas for p in priors])
    root0 = jnp.stack([p.root_orient for p in priors])
    trans0 = jnp.stack([p.trans for p in priors])

    mesh = make_mesh(min(len(jax.devices()), 8), model=1)
    solver = MultiSequenceSolver(body, cfg, mesh=mesh)
    out = solver.solve(markers, weights, o_pose, o_betas, root0, trans0)

    assert out["scores"].shape == (S, 2)
    assert out["lbfgs_evals"] > 0
    params = out["params"]
    # every sequence individually recovers its ground truth
    for s in range(S):
        gt = gts[s]
        out_gt = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
        out_s = lbs_forward(
            body,
            params.pose_body[s],
            jnp.broadcast_to(params.betas[s], (F, 10)),
            params.root_orient[s],
            params.trans[s],
        )
        err = float(jnp.mean(jnp.linalg.norm(out_s["joints"][:, :22] - out_gt["joints"][:, :22], axis=-1))) * 1e3
        assert err < 60.0, f"sequence {s}: MPJPE {err:.1f} mm"
