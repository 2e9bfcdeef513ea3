"""Part-based fitting: batched kinematic-subtree search.

TPU-native re-design of the reference's ``find_best_part_fits``
(``markers_utils.py:274-638``): where the reference runs a sequential
tqdm loop of S independent LBFGS fits (one per candidate subtree), here
every subtree becomes a lane of a padded [S, V] vertex-mask batch and all
S fits run as ONE vmapped L-BFGS program (SURVEY.md §2.8, §7 hard part 4).

Flow (cluster mode, the shipped default):
  host:   rigid clusters -> chain length k -> enumerate subtrees with k
          nodes -> dedup at 0.9 overlap -> [S, V] vertex masks
  device: vmapped fit of {yaw, trans[F,3], betas[10]} per subtree with
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
from uuo_mocap_tpu.pipeline.stages import SmplParams, _forward, _stage_opts
from uuo_mocap_tpu.solver import LbfgsOptions, lbfgs_minimize
from uuo_mocap_tpu.solver import losses as L


class PartFitResult(NamedTuple):
    params: SmplParams  # winning fit (pose = o_pose_body, yaw-rotated root)
    marker_labels: jnp.ndarray  # [F, M] relabeled by nearest vertex
    marker_weights: jnp.ndarray  # [F, M] confidence (2nd-best / best ratio)
    chain: np.ndarray  # winning subtree joint ids (host)
    distance: jnp.ndarray  # winning bidirectional chamfer
    aabb_volume_ratio: jnp.ndarray
    subtree_losses: jnp.ndarray  # [S] all subtree scores
    lbfgs_evals: int  # total closure evaluations across all subtree lanes


def enumerate_subtree_masks(
    model: BodyModel, num_bones: int, similarity_threshold: float | None = 0.9,
    pad_multiple: int = 8,
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
    def _fit_batch(self):
        cfg = self.config
        scfg = cfg["stages"]["part"]
        losses = scfg["losses"]
        opts = _stage_opts(cfg, "part")
        model = self.model
        vertex_labels = self.vertex_labels

        def fit_one(vertex_mask, markers, marker_weights, o_pose_body, o_betas,
                    root_orient0, foot_contacts):
            """One subtree lane (reference ``markers_utils.py:416-564``)."""
            F = markers.shape[0]
            trans0 = jnp.median(markers, axis=1)  # reference seeds at marker median (:418)
            params0 = {"z": jnp.zeros((1, 1, 1)), "trans": trans0, "betas": o_betas}

            def apply_root(z):
                return rot.rot_z(jnp.broadcast_to(z, (F, 1, 1))) @ root_orient0

            def loss_fn(p):
                z_root = apply_root(p["z"])
                sp = SmplParams(o_pose_body, p["betas"], z_root, p["trans"])
                out = _forward(model, sp)
                total = 0.0
                # single-directional chamfer markers -> masked part vertices
                # (reference markers_utils.py:471-476; unweighted there)
                total += losses["chamfer"] * masked_chamfer_vertex_subset(
                    markers, out["vertices"], marker_weights, vertex_mask, single_directional=True
                )
                if "reg_betas" in losses:
                    total += losses["reg_betas"] * L.mse(p["betas"], o_betas)
                if "foot_contact" in losses:
                    total += losses["foot_contact"] * L.foot_contact_loss(out["joints"], foot_contacts)
                if "foot_velocity" in losses:
                    total += L.foot_velocity_loss(out["joints"], foot_contacts) * losses["foot_velocity"]
                if "velocity" in losses:
                    total += losses["velocity"] * L.velocity_loss(p["trans"], jnp.mean(markers, axis=1))
                if "ground" in losses:
                    total += losses["ground"] * L.ground_loss_vertices(out["vertices"])
                return total

            p_opt, res = lbfgs_minimize(loss_fn, params0, opts)

            z_root = apply_root(p_opt["z"])
            sp = SmplParams(o_pose_body, p_opt["betas"], z_root, p_opt["trans"])
            out = _forward(model, sp)
            # bidirectional chamfer score (reference markers_utils.py:575-580)
            score = masked_chamfer_vertex_subset(
                markers, out["vertices"], marker_weights, vertex_mask, single_directional=False
            )
            return p_opt["betas"], z_root, p_opt["trans"], score, out["vertices"], res.num_evals

        LANE_CHUNK = 8  # subtree lanes per step: bounds HBM at ~8 full LBS
        # forwards + chamfer chunks (the padded batch is a multiple of 8)

        @jax.jit
        def run(vertex_masks, markers, marker_weights, o_pose_body, o_betas,
                root_orient0, foot_contacts):
            S = vertex_masks.shape[0]
            grouped = vertex_masks.reshape(S // LANE_CHUNK, LANE_CHUNK, -1)

            def group_fn(masks_g):
                return jax.vmap(fit_one, in_axes=(0, None, None, None, None, None, None))(
                    masks_g, markers, marker_weights, o_pose_body, o_betas, root_orient0, foot_contacts
                )

            out = jax.lax.map(group_fn, grouped)  # loops groups, vmaps within
            return jax.tree_util.tree_map(lambda a: a.reshape((S,) + a.shape[2:]), out)

        return run

    @functools.cached_property
    def _relabel(self):
        vertex_labels = self.vertex_labels

        @jax.jit
        def run(markers, best_vertices):
            """Nearest-vertex label per marker, averaged over frames
            (reference ``markers_utils.py:592-597``)."""

            def body(acc, inp):
                m_f, v_f = inp
                return acc + jnp.sqrt(squared_distance_matrix(m_f, v_f) + 1e-18), None

            M, V = markers.shape[1], best_vertices.shape[1]
            acc, _ = jax.lax.scan(body, jnp.zeros((M, V), markers.dtype), (markers, best_vertices))
            nearest = jnp.argmin(acc, axis=-1)  # [M]
            return vertex_labels[nearest]

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
            masks = np.ones((1, self.model.num_vertices), np.float32)
            subtrees = [list(range(len(self.model.parents)))]
        else:
            masks, subtrees = enumerate_subtree_masks(
                self.model,
                num_bones=num_rigid_groups,
                similarity_threshold=scfg.get("similarity_threshold"),
            )
        if foot_contacts is None:
            foot_contacts = jnp.zeros((F, 2), markers.dtype)

        betas_s, roots_s, trans_s, scores_s, verts_s, evals_s = self._fit_batch(
            jnp.asarray(masks), markers, marker_weights, o_pose_body, o_betas,
            root_orient0, foot_contacts,
        )

        # padding lanes repeat real subtrees, so plain argmin is safe
        scores = np.asarray(scores_s)
        best = int(np.argmin(scores))
        order = np.argsort(scores)

        labels = self._relabel(markers, verts_s[best])  # [M]
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
            params=SmplParams(o_pose_body, betas_s[best], roots_s[best], trans_s[best]),
            marker_labels=marker_labels,
            marker_weights=weights_out,
            chain=np.asarray(subtrees[best % len(subtrees)], np.int32),
            distance=jnp.asarray(scores[best]),
            aabb_volume_ratio=aabb_ratio,
            subtree_losses=scores_s,
            lbfgs_evals=int(np.sum(np.asarray(evals_s))),
        )
