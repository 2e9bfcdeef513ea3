"""Subtree-tournament pruning (``parallel.part_prune``): the two-phase part
fit (partial descent of all subtree lanes -> score -> survivors descend to
convergence) must pick the same winning chain as the full search and spend
fewer closure evals.

The reference descends every candidate subtree to convergence inside a
sequential loop (``markers_utils.py:416-564``) before the argmin
(``:575-580``); part_prune is this framework's opt-in shortcut, symmetric to
``parallel.hypothesis_prune`` on the yaw lanes."""
import numpy as np
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.pipeline.part_fit import PartFitter

pytestmark = pytest.mark.slow  # multi-descent tier (see pyproject)


def _scene(body, Q=2, F=10, M=14):
    mk_b, pose_b, betas_b, root_b = [], [], [], []
    for q in range(Q):
        gt = random_pose_sequence(F, seed=700 + q, yaw=0.3 * q)
        mk = generate_markers(body, gt, num_markers=M, seed=800 + q)
        prior = perturb_params(gt, seed=900 + q, pose_noise=0.03, trans_noise=0.05)
        mk_b.append(np.asarray(mk.points))
        pose_b.append(np.asarray(prior.pose_body))
        betas_b.append(np.asarray(prior.betas))
        root_b.append(np.asarray(prior.root_orient))
    return (jnp.asarray(np.stack(mk_b)), jnp.asarray(np.stack(pose_b)),
            jnp.asarray(np.stack(betas_b)), jnp.asarray(np.stack(root_b)))


def _cfg(prune):
    cfg = load_config("configs/video_mocap.yaml")
    cfg["stages"]["part"]["num_iters"] = 60
    if prune:
        cfg["parallel"] = {"part_prune": {"enabled": True, "at_iters": 15, "keep": 2}}
    return cfg


def test_part_prune_matches_full_search():
    body = synthetic_body_model()
    markers_b, pose_b, betas_b, root_b = _scene(body)
    Q, F, M = markers_b.shape[0], markers_b.shape[1], markers_b.shape[2]
    w_b = jnp.ones((Q, F, M))

    fit_full = PartFitter(body, _cfg(False)).fit_batch(
        markers_b, w_b, pose_b, betas_b, root_b, num_rigid_groups=[3] * Q)
    fit_pr = PartFitter(body, _cfg(True)).fit_batch(
        markers_b, w_b, pose_b, betas_b, root_b, num_rigid_groups=[3] * Q)

    ev_full = sum(r.lbfgs_evals for r in fit_full)
    ev_pr = sum(r.lbfgs_evals for r in fit_pr)
    assert ev_pr < ev_full, (ev_pr, ev_full)

    for q in range(Q):
        # same winning subtree on this easy problem
        assert fit_pr[q].chain.tolist() == fit_full[q].chain.tolist()
        # winner warm-started from its own partial descent: same basin
        d = float(jnp.max(jnp.abs(fit_pr[q].params.trans - fit_full[q].params.trans)))
        assert d < 0.05, d
        # score table: every subtree has a finite score (pruned lanes keep
        # their tournament score), winner's is the row minimum
        row = np.asarray(fit_pr[q].subtree_losses)
        assert np.all(np.isfinite(row))
        assert float(fit_pr[q].distance) == pytest.approx(float(row.min()), rel=1e-6)


def test_part_prune_cascade_shapes():
    """Cascade (lists) prunes in rounds and still returns a full score row."""
    body = synthetic_body_model()
    markers_b, pose_b, betas_b, root_b = _scene(body, Q=1)
    Q, F, M = markers_b.shape[0], markers_b.shape[1], markers_b.shape[2]
    cfg = _cfg(True)
    cfg["parallel"]["part_prune"] = {
        "enabled": True, "at_iters": [10, 25], "keep": [4, 2]}
    fits = PartFitter(body, cfg).fit_batch(
        jnp.asarray(markers_b), jnp.ones((Q, F, M)), pose_b, betas_b, root_b,
        num_rigid_groups=[3] * Q)
    row = np.asarray(fits[0].subtree_losses)
    assert row.ndim == 1 and np.all(np.isfinite(row))
    assert fits[0].lbfgs_evals > 0


@pytest.mark.slow  # default-off feature (a recorded counter-result at bench
# scale); two full part fits + fresh strided-shape compiles blow the fast budget
def test_part_prune_frame_stride_matches():
    """Frame-strided tournament rounds (``part_prune.frame_stride``): the
    cull descends on every 2nd frame, the final descent runs full frames
    from a re-strided warm start — winner and basin must match the
    unstrided prune."""
    body = synthetic_body_model()
    markers_b, pose_b, betas_b, root_b = _scene(body)
    Q, F, M = markers_b.shape[0], markers_b.shape[1], markers_b.shape[2]
    w_b = jnp.ones((Q, F, M))

    fit_pr = PartFitter(body, _cfg(True)).fit_batch(
        markers_b, w_b, pose_b, betas_b, root_b, num_rigid_groups=[3] * Q)
    cfg_s = _cfg(True)
    cfg_s["parallel"]["part_prune"]["frame_stride"] = 2
    fit_s = PartFitter(body, cfg_s).fit_batch(
        markers_b, w_b, pose_b, betas_b, root_b, num_rigid_groups=[3] * Q)

    for q in range(Q):
        assert fit_s[q].chain.tolist() == fit_pr[q].chain.tolist()
        # full-frame final descent: trans must come back at full F and land
        # in the same basin as the unstrided prune
        assert fit_s[q].params.trans.shape[0] == F
        d = float(jnp.max(jnp.abs(fit_s[q].params.trans - fit_pr[q].params.trans)))
        assert d < 0.05, d
