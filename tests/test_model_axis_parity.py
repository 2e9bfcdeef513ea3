"""Model-axis (vertex-sharded) numerics: the production solve on a
``{model: 2}`` mesh must agree with ``{model: 1}`` (VERDICT r3 item 5).

The ``model`` axis shards the SMPL [V, ...] tensors by vertex through the
SAME stage programs (``parallel/mesh._shard_model_by_vertex``); GSPMD
completes the chamfer min-over-V with a collective.  That transformation
must not change the solve — this is the multi-chip CORRECTNESS standard of
SURVEY.md §4 (parity, not liveness), pinned on the virtual CPU mesh.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver
from uuo_mocap_tpu.parallel.mesh import make_mesh
from uuo_mocap_tpu.pipeline.multimodal import prepare_sequence

pytestmark = pytest.mark.slow  # full-solve e2e tier (see pyproject)


def test_model_axis_matches_unsharded():
    body = synthetic_body_model()
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 2
    cfg["stages"]["part"]["num_iters"] = 3
    cfg["stages"]["chamfer"]["num_iters"] = 3
    cfg["stages"]["marker"]["num_iters"] = 3

    Q, F, M = 2, 32, 12
    preps = []
    for q in range(Q):
        gt = random_pose_sequence(F, seed=40 + q)
        mk = generate_markers(body, gt, num_markers=M, seed=50 + q)
        prior = perturb_params(gt, seed=60 + q, pose_noise=0.02)
        preps.append(prepare_sequence(
            ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)), frame_bucket=None
        ))

    out2 = MultiSequenceSolver(body, cfg, mesh=make_mesh(4, model=2)).solve_prepared(preps)
    out1 = MultiSequenceSolver(body, cfg, mesh=make_mesh(4, model=1)).solve_prepared(preps)

    def joints(r):
        return lbs_forward(
            body, jnp.asarray(r["pose_body"]), jnp.asarray(r["betas"]),
            jnp.asarray(r["root_orient"]), jnp.asarray(r["trans"]),
        )["joints"][:, :22]

    assert (out2["best_hypothesis"] == out1["best_hypothesis"]).all()
    for q in range(Q):
        d_mm = float(jnp.max(jnp.linalg.norm(
            joints(out2["results"][q]) - joints(out1["results"][q]), axis=-1
        ))) * 1e3
        # float drift only: same math, different reduction partitioning
        assert d_mm < 2.0, f"sequence {q}: vertex sharding changed the solve by {d_mm:.3f} mm"
