"""Hypothesis pruning: the two-phase chamfer stage (partial descent of all
yaw lanes -> tournament -> survivors descend to convergence) must pick the
same winner as the full sweep and spend fewer closure evals on it.

The reference descends every yaw hypothesis to convergence before holding
the tournament (``multimodal.py:462-599``); pruning is this framework's
opt-in shortcut (``parallel.hypothesis_prune``), so the test pins both its
correctness on an easy problem and its eval saving.
"""
import numpy as np
import jax.numpy as jnp
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


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def _make(body, Q, F, M):
    preps, gts = [], []
    for q in range(Q):
        gt = random_pose_sequence(F, seed=400 + q, yaw=0.2 * q)
        mk = generate_markers(body, gt, num_markers=M, seed=500 + q)
        prior = perturb_params(gt, seed=600 + q, pose_noise=0.03, trans_noise=0.05)
        preps.append(prepare_sequence(
            ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)),
            frame_bucket=None,
        ))
        gts.append(gt)
    return preps, gts


def _cfg(prune):
    cfg = load_config("configs/video_mocap.yaml")
    # sized to the 1-vCPU test host: 2 yaw lanes, no part fit (the prune
    # path never touches it), ONE streaming width (2) shared by every run
    # so both configs reuse the same compiled programs
    cfg["num_root_orient_angles"] = 2
    cfg["find_best_part_fits"] = False
    # 150 = 3 x SEGMENT_SIZE(50): the phase-1 cap (one 50-iter segment)
    # truncates the descent early enough that pruning's saving (losing
    # lanes skip 2/3 of their budget) dominates the survivors' warm-started
    # re-descent
    cfg["stages"]["chamfer"]["num_iters"] = 150
    cfg["stages"]["marker"]["num_iters"] = 30
    cfg["parallel"] = {"lane_width": 2}
    if prune:
        cfg["parallel"]["hypothesis_prune"] = {
            "enabled": True, "at_iters": 50, "keep": 1,
        }
    return cfg


def _mpjpe_mm(body, gt, r):
    F = gt.trans.shape[0]
    og = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)),
                     gt.root_orient, gt.trans)
    os_ = lbs_forward(body, jnp.asarray(r["pose_body"]), jnp.asarray(r["betas"]),
                      jnp.asarray(r["root_orient"]), jnp.asarray(r["trans"]))
    return float(jnp.mean(jnp.linalg.norm(
        os_["joints"][:, :22] - og["joints"][:, :22], axis=-1))) * 1e3


def test_prune_matches_full_sweep(body):
    Q, F, M = 2, 12, 16
    preps, gts = _make(body, Q, F, M)
    mesh = make_mesh(8, model=1)

    out_full = MultiSequenceSolver(body, _cfg(False), mesh=mesh).solve_prepared(preps)
    out_pr = MultiSequenceSolver(body, _cfg(True), mesh=mesh).solve_prepared(preps)

    # survivors-only score table, original-angle best ids
    assert out_full["scores"].shape == (Q, 2)
    assert out_pr["scores"].shape == (Q, 1)
    for q in range(Q):
        # the winner survives the phase-1 tournament on this easy problem
        assert out_pr["results"][q]["best_hypothesis"] == \
            out_full["results"][q]["best_hypothesis"]
        e_full = _mpjpe_mm(body, gts[q], out_full["results"][q])
        e_pr = _mpjpe_mm(body, gts[q], out_pr["results"][q])
        # same winner warm-started from its own partial descent: the final
        # fit must land in the same basin (loose bound: mid-descent noise)
        assert abs(e_pr - e_full) < max(0.25 * e_full, 5.0), (e_pr, e_full)

    # pruning must RETIRE losing lanes: fewer chamfer lane-evals in total
    ev_full = out_full["eval_stats"]["chamfer"]["lane_evals"]
    ev_pr = out_pr["eval_stats"]["chamfer"]["lane_evals"]
    assert ev_pr < ev_full, (ev_pr, ev_full)


def test_prune_cascade(body):
    """Multi-round cascade (at_iters/keep as lists): 4 yaw lanes -> 2 at the
    early tournament -> 1 at the runoff; the survivor must match the
    single-round prune's winner and land at comparable accuracy."""
    Q, F, M = 1, 12, 16
    preps, gts = _make(body, Q, F, M)

    cfg1 = _cfg(True)
    cfg1["num_root_orient_angles"] = 4
    cfg1["parallel"]["lane_width"] = 4
    out1 = MultiSequenceSolver(body, cfg1).solve_prepared(preps)

    cfgc = _cfg(True)
    cfgc["num_root_orient_angles"] = 4
    cfgc["parallel"]["lane_width"] = 4
    cfgc["parallel"]["hypothesis_prune"] = {
        "enabled": True, "at_iters": [20, 50], "keep": [2, 1],
    }
    outc = MultiSequenceSolver(body, cfgc).solve_prepared(preps)

    assert outc["scores"].shape == (Q, 1)
    assert outc["results"][0]["best_hypothesis"] == \
        out1["results"][0]["best_hypothesis"]
    e1 = _mpjpe_mm(body, gts[0], out1["results"][0])
    ec = _mpjpe_mm(body, gts[0], outc["results"][0])
    assert abs(ec - e1) < max(0.25 * e1, 5.0), (ec, e1)
    # Lane-eval bound is LOOSE at toy scale: every round boundary resets the
    # L-BFGS state, and the restart cost (re-establishing step lengths) only
    # amortizes at production iteration budgets (bench-scale numbers live in
    # Benchmarks.md).  The toy cascade (20/50-iter rounds) just must not
    # blow up.
    assert outc["eval_stats"]["chamfer"]["lane_evals"] <= \
        out1["eval_stats"]["chamfer"]["lane_evals"] * 1.3


def test_prune_frame_stride(body):
    """Frame-axis coarse-to-fine (``hypothesis_prune.frame_stride``): the
    phase-1 tournament descends on every 2nd frame and survivors re-enter
    full-frame phase 2 from upsampled warm starts.  The winner and the final
    accuracy must match the unstrided prune (the strided rounds only have to
    RANK lanes; phase 2 re-descends the exact objective)."""
    Q, F, M = 2, 12, 16
    preps, gts = _make(body, Q, F, M)

    out1 = MultiSequenceSolver(body, _cfg(True)).solve_prepared(preps)

    cfgs = _cfg(True)
    cfgs["parallel"]["hypothesis_prune"]["frame_stride"] = 2
    outs = MultiSequenceSolver(body, cfgs).solve_prepared(preps)

    assert outs["scores"].shape == (Q, 1)
    for q in range(Q):
        assert outs["results"][q]["best_hypothesis"] == \
            out1["results"][q]["best_hypothesis"]
        e1 = _mpjpe_mm(body, gts[q], out1["results"][q])
        es = _mpjpe_mm(body, gts[q], outs["results"][q])
        # full-frame phase 2 re-descends the exact objective from the
        # upsampled warm start; same-basin bound as the prune tests
        assert abs(es - e1) < max(0.25 * e1, 5.0), (es, e1)
    # per-lane shapes must come back at full F regardless of the stride
    r = outs["results"][0]
    assert np.asarray(r["pose_body"]).shape[0] == F
    assert np.asarray(r["trans"]).shape[0] == F
