"""Part-based fitting: batched kinematic-subtree search.

TPU-native re-design of the reference's ``find_best_part_fits``
(``markers_utils.py:274-638``): where the reference runs a sequential
tqdm loop of S independent LBFGS fits (one per candidate subtree), here
every subtree becomes a lane of a padded [S, V] vertex-mask batch and all
S fits advance together through the segmented ``BatchedLbfgs`` driver
(SURVEY.md §2.8, §7 hard part 4), lane-chunked to bound HBM.

Flow (cluster mode, the shipped default):
  host:   rigid clusters -> chain length k -> enumerate subtrees with k
          nodes -> dedup at 0.9 overlap -> [S, V] vertex masks
  device: batched fit of {yaw, trans[F,3], betas[10]} per subtree with
          single-directional chamfer onto the masked vertex subset
  device: bidirectional chamfer score per subtree -> argmin
  device: relabel markers by nearest vertex of the winning fit
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.joints import get_sub_hierarchies, remove_approximately_redundant_hierarchies
from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import masked_chamfer_vertex_subset, squared_distance_matrix
from uuo_mocap_tpu.ops.geometry import get_aabb, get_aabb_volume
from uuo_mocap_tpu.pipeline.stages import SEGMENT_SIZE, SmplParams, _forward, _stage_opts
from uuo_mocap_tpu.solver import losses as L
from uuo_mocap_tpu.solver.lbfgs import BatchedLbfgs


class PartFitResult(NamedTuple):
    params: SmplParams  # winning fit (pose = o_pose_body, yaw-rotated root)
    marker_labels: jnp.ndarray  # [F, M] relabeled by nearest vertex
    marker_weights: jnp.ndarray  # [F, M] confidence (2nd-best / best ratio)
    chain: np.ndarray  # winning subtree joint ids (host)
    distance: jnp.ndarray  # winning bidirectional chamfer
    aabb_volume_ratio: jnp.ndarray
    subtree_losses: jnp.ndarray  # [S] all subtree scores
    lbfgs_evals: int  # total closure evaluations across all subtree lanes


LANE_CHUNK = 8  # subtree lanes per lax.map step — bounds HBM


def enumerate_subtree_masks(
    model: BodyModel, num_bones: int, similarity_threshold: float | None = 0.9,
    pad_multiple: int = LANE_CHUNK,
) -> Tuple[np.ndarray, List[List[int]]]:
    """Host: subtrees with ``num_bones`` nodes -> padded [S, V] vertex masks.

    Padding lanes repeat the first subtree (harmless — argmin dedups) so S
    hits a bucket size and avoids per-sequence recompiles.
    """
    parents = model.parents
    subtrees = get_sub_hierarchies(parents, num_bones)
    if similarity_threshold is not None and len(subtrees) > 1:
        subtrees = remove_approximately_redundant_hierarchies(subtrees, similarity_threshold)

    vertex_labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
    V = vertex_labels.shape[0]
    S = len(subtrees)
    S_pad = max(pad_multiple, ((S + pad_multiple - 1) // pad_multiple) * pad_multiple)
    masks = np.zeros((S_pad, V), np.float32)
    for i in range(S_pad):
        for j in subtrees[i % S]:
            masks[i, vertex_labels == j] = 1.0
    return masks, subtrees


class PartFitter:
    def __init__(self, model: BodyModel, config: Dict[str, Any]):
        self.model = model
        self.config = config
        self.vertex_labels = jnp.argmax(model.lbs_weights, axis=-1)

    @functools.cached_property
    def _solver(self) -> BatchedLbfgs:
        cfg = self.config
        scfg = cfg["stages"]["part"]
        losses = scfg["losses"]
        model = self.model

        def fun(p, lane, shared):
            """One subtree lane (reference ``markers_utils.py:416-564``)."""
            vertex_mask = lane["vertex_mask"]
            markers = shared["markers"]
            F = markers.shape[0]
            z_root = rot.rot_z(jnp.broadcast_to(p["z"], (F, 1, 1))) @ shared["root_orient0"]
            sp = SmplParams(shared["o_pose_body"], p["betas"], z_root, p["trans"])
            out = _forward(model, sp)
            total = 0.0
            # single-directional chamfer markers -> masked part vertices
            # (reference markers_utils.py:471-476; unweighted there)
            total += losses["chamfer"] * masked_chamfer_vertex_subset(
                markers, out["vertices"], shared["marker_weights"], vertex_mask, single_directional=True
            )
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], shared["o_betas"])
            if "foot_contact" in losses:
                total += losses["foot_contact"] * L.foot_contact_loss(out["joints"], shared["foot_contacts"])
            if "foot_velocity" in losses:
                total += losses["foot_velocity"] * L.foot_velocity_loss(out["joints"], shared["foot_contacts"])
            if "velocity" in losses:
                total += losses["velocity"] * L.velocity_loss(p["trans"], jnp.mean(markers, axis=1))
            if "ground" in losses:
                total += losses["ground"] * L.ground_loss_vertices(out["vertices"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "part"), segment_size=SEGMENT_SIZE, lane_chunk=LANE_CHUNK)

    @functools.cached_property
    def _score_batch(self):
        model = self.model

        def score_one(z, betas, trans, vertex_mask, markers, marker_weights, o_pose_body, root_orient0):
            F = markers.shape[0]
            z_root = rot.rot_z(jnp.broadcast_to(z, (F, 1, 1))) @ root_orient0
            sp = SmplParams(o_pose_body, betas, z_root, trans)
            out = _forward(model, sp)
            # bidirectional chamfer score (reference markers_utils.py:575-580)
            return masked_chamfer_vertex_subset(
                markers, out["vertices"], marker_weights, vertex_mask, single_directional=False
            )

        vm = jax.vmap(score_one, in_axes=(0, 0, 0, 0, None, None, None, None))

        @jax.jit
        def run(z_b, betas_b, trans_b, masks, markers, marker_weights, o_pose_body, root_orient0):
            S = masks.shape[0]
            G = S // LANE_CHUNK

            def g(a):
                return a.reshape((G, LANE_CHUNK) + a.shape[1:])

            out = jax.lax.map(
                lambda args: vm(*args, markers, marker_weights, o_pose_body, root_orient0),
                (g(z_b), g(betas_b), g(trans_b), g(masks)),
            )
            return out.reshape(S)

        return run

    @functools.cached_property
    def _relabel(self):
        vertex_labels = self.vertex_labels
        model = self.model

        @jax.jit
        def run(markers, best_z, best_betas, best_trans, o_pose_body, root_orient0):
            """Nearest-vertex label per marker, averaged over frames
            (reference ``markers_utils.py:592-597``)."""
            F = markers.shape[0]
            z_root = rot.rot_z(jnp.broadcast_to(best_z, (F, 1, 1))) @ root_orient0
            sp = SmplParams(o_pose_body, best_betas, z_root, best_trans)
            out = _forward(model, sp)
            best_vertices = out["vertices"]

            def body(acc, inp):
                m_f, v_f = inp
                return acc + jnp.sqrt(squared_distance_matrix(m_f, v_f) + 1e-18), None

            M, V = markers.shape[1], best_vertices.shape[1]
            acc, _ = jax.lax.scan(body, jnp.zeros((M, V), markers.dtype), (markers, best_vertices))
            nearest = jnp.argmin(acc, axis=-1)  # [M]
            return vertex_labels[nearest], z_root

        return run

    def __call__(
        self,
        markers: jnp.ndarray,  # [F, M, 3]
        marker_weights: jnp.ndarray,  # [F, M]
        o_pose_body: jnp.ndarray,  # [F, 23, 3, 3]
        o_betas: jnp.ndarray,  # [1, 10]
        root_orient0: jnp.ndarray,  # [F, 1, 3, 3]
        num_rigid_groups: int,
        foot_contacts: jnp.ndarray | None = None,  # [F, 2]
    ) -> PartFitResult:
        scfg = self.config["stages"]["part"]
        F, M, _ = markers.shape

        if scfg.get("use_full_skeleton"):
            masks_np = np.ones((LANE_CHUNK, self.model.num_vertices), np.float32)
            subtrees = [list(range(len(self.model.parents)))]
        else:
            masks_np, subtrees = enumerate_subtree_masks(
                self.model,
                num_bones=num_rigid_groups,
                similarity_threshold=scfg.get("similarity_threshold"),
            )
        if foot_contacts is None:
            foot_contacts = jnp.zeros((F, 2), markers.dtype)

        masks = jnp.asarray(masks_np)
        S = masks.shape[0]
        trans0 = jnp.median(markers, axis=1)  # reference seeds at marker median (:418)

        def tile(x):
            return jnp.broadcast_to(x[None], (S,) + x.shape)

        params0 = {"z": jnp.zeros((S, 1, 1, 1)), "trans": tile(trans0), "betas": tile(o_betas)}
        lane = {"vertex_mask": masks}
        shared = {
            "markers": markers, "marker_weights": marker_weights,
            "o_pose_body": o_pose_body, "o_betas": o_betas,
            "root_orient0": root_orient0, "foot_contacts": foot_contacts,
        }
        p_opt, res = self._solver.run(params0, lane, shared)

        scores_s = self._score_batch(
            p_opt["z"], p_opt["betas"], p_opt["trans"], masks,
            markers, marker_weights, o_pose_body, root_orient0,
        )

        # padding lanes repeat real subtrees, so plain argmin is safe
        scores = np.asarray(scores_s)
        best = int(np.argmin(scores))

        labels, best_root = self._relabel(
            markers, p_opt["z"][best], p_opt["betas"][best], p_opt["trans"][best],
            o_pose_body, root_orient0,
        )
        marker_labels = jnp.broadcast_to(labels[None], (F, M))

        # confidence: 2nd-best / best score ratio (reference :612-617)
        uniq = np.unique(np.round(scores, 12))
        ratio = float(uniq[1] / uniq[0]) if len(uniq) > 1 else 0.0
        weights_out = jnp.full((F, M), ratio, markers.dtype)
        weights_out = weights_out / jnp.maximum(jnp.max(weights_out), 1e-12)

        aabb_ratio = get_aabb_volume(get_aabb(markers.reshape(-1, 3))) / jnp.maximum(
            get_aabb_volume(get_aabb(markers.reshape(-1, 3))), 1e-12
        )  # cluster mode fits all markers -> ratio 1 (subset == full)

        return PartFitResult(
            params=SmplParams(o_pose_body, p_opt["betas"][best], best_root, p_opt["trans"][best]),
            marker_labels=marker_labels,
            marker_weights=weights_out,
            chain=np.asarray(subtrees[best % len(subtrees)], np.int32),
            distance=jnp.asarray(scores[best]),
            aabb_volume_ratio=aabb_ratio,
            subtree_losses=scores_s,
            lbfgs_evals=int(np.sum(np.asarray(res.num_evals))),
        )
