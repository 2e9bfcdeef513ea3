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
import os
import time
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.joints import get_sub_hierarchies, remove_approximately_redundant_hierarchies
from uuo_mocap_tpu.body.model import BodyModel, lbs_forward_at
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import masked_chamfer_vertex_subset, squared_distance_matrix
from uuo_mocap_tpu.ops.geometry import get_aabb, get_aabb_volume, upsample_frames
from uuo_mocap_tpu.pipeline.stages import (
    SEGMENT_SIZE, SmplParams, _data, _forward, _ranked_nearest, _stage_opts,
)
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
        from uuo_mocap_tpu.solver.aot import AotCache, config_fingerprint, model_fingerprint

        # persistent AOT program cache (see stages.SolveStages / solver/aot.py)
        self._aot = AotCache(
            extra=config_fingerprint(config) + ":" + model_fingerprint(model))

    @functools.cached_property
    def _solver(self) -> BatchedLbfgs:
        cfg = self.config
        scfg = cfg["stages"]["part"]
        losses = scfg["losses"]
        model = self.model

        # sparse-gradient path applies unless a loss needs the dense
        # vertex cloud with gradients (only ``ground`` here); joints come
        # from the gathered forward's kinematic chain either way
        sparse = "ground" not in losses

        def fun(p, lane, shared):
            """One subtree lane (reference ``markers_utils.py:416-564``).

            Per-sequence tensors read through the merged lane/shared view so
            the multi-sequence sweep can lane-batch them (stages._data)."""
            d = _data(lane, shared)
            vertex_mask = d["vertex_mask"]
            markers = d["markers"]
            F = markers.shape[0]
            z_root = rot.rot_z(jnp.broadcast_to(p["z"], (F, 1, 1))) @ d["root_orient0"]
            sp = SmplParams(d["o_pose_body"], p["betas"], z_root, p["trans"])
            total = 0.0
            # single-directional chamfer markers -> masked part vertices
            # (reference markers_utils.py:471-476; unweighted there)
            if sparse:
                sp_ng = jax.tree_util.tree_map(jax.lax.stop_gradient, sp)
                verts_ng = _forward(model, sp_ng)["vertices"]
                bias = (1.0 - (vertex_mask > 0)) * 1e10
                idx = _ranked_nearest(markers, verts_ng, bias)  # [F, M] within the subtree
                at = lbs_forward_at(
                    model, sp.pose_body, jnp.broadcast_to(sp.betas, (F, 10)),
                    sp.root_orient, sp.trans, idx,
                )
                d2 = jnp.sum((markers - at["points"]) ** 2, axis=-1)
                w = d["marker_weights"].astype(markers.dtype)
                total += losses["chamfer"] * (
                    jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1e-12)
                )
                joints = at["joints"]
            else:
                out = _forward(model, sp)
                total += losses["chamfer"] * masked_chamfer_vertex_subset(
                    markers, out["vertices"], d["marker_weights"], vertex_mask,
                    single_directional=True,
                )
                joints = out["joints"]
                if "ground" in losses:
                    total += losses["ground"] * L.ground_loss_vertices(
                        out["vertices"], d["frame_valid"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], d["o_betas"])
            if "foot_contact" in losses:
                total += losses["foot_contact"] * L.foot_contact_loss(joints, d["foot_contacts"])
            if "foot_velocity" in losses:
                total += losses["foot_velocity"] * L.foot_velocity_loss(joints, d["foot_contacts"])
            if "velocity" in losses:
                total += losses["velocity"] * L.velocity_loss(
                    p["trans"], jnp.mean(markers, axis=1), d["frame_valid"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "part"), segment_size=SEGMENT_SIZE,
                            lane_chunk=LANE_CHUNK, aot=self._aot, name="part")

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

        return self._aot.wrap("part_score_batch", jax.jit(run))

    @functools.cached_property
    def _relabel_fn(self):
        vertex_labels = self.vertex_labels
        model = self.model

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

    @functools.cached_property
    def _relabel(self):
        return self._aot.wrap("part_relabel", jax.jit(self._relabel_fn))

    @functools.cached_property
    def _relabel_q(self):
        return self._aot.wrap("part_relabel_q", jax.jit(jax.vmap(self._relabel_fn)))

    def _score_lanes_any(self, *args):
        """``_score_lanes`` for ANY lane count: pads to the next LANE_CHUNK
        multiple by clamping to the last lane (pruned survivor sets are no
        longer a chunk multiple)."""
        Ln = args[0].shape[0]
        pad = (-Ln) % LANE_CHUNK
        if pad:
            idx = jnp.asarray(np.clip(np.arange(Ln + pad), 0, Ln - 1))
            args = tuple(a[idx] for a in args)
        out = self._score_lanes(*args)
        return out[:Ln]

    @functools.cached_property
    def _score_lanes(self):
        """Per-lane bidirectional chamfer score — every arg lane-batched
        (multi-sequence form of ``_score_batch``)."""
        model = self.model

        def score_one(z, betas, trans, vertex_mask, markers, marker_weights, o_pose_body, root_orient0):
            F = markers.shape[0]
            z_root = rot.rot_z(jnp.broadcast_to(z, (F, 1, 1))) @ root_orient0
            sp = SmplParams(o_pose_body, betas, z_root, trans)
            out = _forward(model, sp)
            return masked_chamfer_vertex_subset(
                markers, out["vertices"], marker_weights, vertex_mask, single_directional=False
            )

        vm = jax.vmap(score_one)

        def run(z_b, betas_b, trans_b, masks, markers_l, weights_l, o_pose_l, root0_l):
            Ln = masks.shape[0]
            G = Ln // LANE_CHUNK

            def g(a):
                return a.reshape((G, LANE_CHUNK) + a.shape[1:])

            out = jax.lax.map(
                lambda args: vm(*args),
                (g(z_b), g(betas_b), g(trans_b), g(masks), g(markers_l), g(weights_l), g(o_pose_l), g(root0_l)),
            )
            return out.reshape(Ln)

        return self._aot.wrap("part_score_lanes", jax.jit(run))

    def fit_batch(
        self,
        markers_b: jnp.ndarray,  # [Q, F, M, 3]
        marker_weights_b: jnp.ndarray,  # [Q, F, M]
        o_pose_body_b: jnp.ndarray,  # [Q, F, 23, 3, 3]
        o_betas_b: jnp.ndarray,  # [Q, 1, 10]
        root_orient0_b: jnp.ndarray,  # [Q, F, 1, 3, 3]
        num_rigid_groups: List[int],  # per sequence
        foot_contacts_b: jnp.ndarray | None = None,  # [Q, F, 2]
        frame_valid_b: jnp.ndarray | None = None,  # [Q, F]
    ) -> List[PartFitResult]:
        """Multi-sequence part fit: Q sequences' subtree searches as ONE
        lane batch (lane = sequence x candidate subtree), the production
        form of the reference's doubly sequential loop (outer sweep
        ``test/test.py:50-147``, inner subtrees ``markers_utils.py:416``).

        Each sequence's subtree set is padded to the common max so all
        lanes share one program; padding lanes duplicate real subtrees and
        are deduplicated by the per-sequence argmin.
        """
        # per-phase wall breakdown (VERDICT r3 item 2: the stage wall was
        # ~10x its eval cost and nobody knew where it went).  Attribution is
        # only exact when UUO_PROFILE_PART_FIT=1 forces a device sync at
        # each boundary; unsynced, async dispatch smears device time into
        # whichever phase first blocks on the result.
        self.last_phase_times: Dict[str, float] = {}
        _prof = os.environ.get("UUO_PROFILE_PART_FIT") == "1"
        _t = [time.time()]

        def tick(label, sync=None):
            if _prof and sync is not None:
                jax.block_until_ready(sync)
            now = time.time()
            self.last_phase_times[label] = (
                self.last_phase_times.get(label, 0.0) + now - _t[0])
            _t[0] = now

        scfg = self.config["stages"]["part"]
        Q, F, M, _ = markers_b.shape
        if foot_contacts_b is None:
            foot_contacts_b = jnp.zeros((Q, F, 2), markers_b.dtype)
        if frame_valid_b is None:
            frame_valid_b = jnp.ones((Q, F), markers_b.dtype)

        per_seq = []
        for q in range(Q):
            if scfg.get("use_full_skeleton"):
                masks_np = np.ones((LANE_CHUNK, self.model.num_vertices), np.float32)
                subtrees = [list(range(len(self.model.parents)))]
            else:
                masks_np, subtrees = enumerate_subtree_masks(
                    self.model, num_bones=int(num_rigid_groups[q]),
                    similarity_threshold=scfg.get("similarity_threshold"),
                )
            # explicit lane -> ORIGINAL subtree index (enumerate pads lane i
            # with subtrees[i % S]); carried through every prune round so a
            # padding lane can never be attributed to the wrong subtree
            orig = np.arange(masks_np.shape[0]) % len(subtrees)
            per_seq.append((masks_np, subtrees, orig))
        S_max = max(m.shape[0] for m, _, _ in per_seq)

        def pad_rows(m):
            if m.shape[0] == S_max:
                return m
            reps = np.arange(S_max - m.shape[0]) % m.shape[0]
            return np.concatenate([m, m[reps]], axis=0)

        masks = jnp.asarray(np.stack([pad_rows(m) for m, _, _ in per_seq]))  # [Q, S_max, V]
        lane_orig = np.stack([pad_rows(o) for _, _, o in per_seq])  # [Q, S_max]
        Ln = Q * S_max

        def lane_rep(x):  # [Q, ...] -> [Q*S_max, ...] (sequence-major)
            return jnp.repeat(x, S_max, axis=0)

        markers_l = lane_rep(markers_b)
        weights_l = lane_rep(marker_weights_b)
        o_pose_l = lane_rep(o_pose_body_b)
        o_betas_l = lane_rep(o_betas_b)
        root0_l = lane_rep(root_orient0_b)
        fv_l = lane_rep(frame_valid_b)
        fc_l = lane_rep(foot_contacts_b)
        masks_l = masks.reshape(Ln, -1)

        trans0 = jnp.median(markers_b, axis=2)  # [Q, F, 3]
        params0 = {
            "z": jnp.zeros((Ln, 1, 1, 1)),
            "trans": lane_rep(trans0),
            "betas": o_betas_l,
        }
        lane = {
            "vertex_mask": masks_l, "markers": markers_l, "marker_weights": weights_l,
            "o_pose_body": o_pose_l, "o_betas": o_betas_l, "root_orient0": root0_l,
            "foot_contacts": fc_l, "frame_valid": fv_l,
        }
        # ---- subtree-tournament pruning (opt-in, parallel.part_prune):
        # the subtree search is a tournament — only the argmin-score subtree's
        # fit survives (plus the 2nd-best score for the confidence ratio).
        # Obviously-wrong subtrees (leg markers fit to an arm) are ranked out
        # within a few iterations, yet the full search descends every lane to
        # convergence (~45 iters).  Phase 1 partially descends ALL lanes
        # (iter_cap, same compiled programs), scores them with the SAME
        # bidirectional chamfer the final argmin uses, and later phases
        # descend only the best ``keep`` subtrees per sequence, warm-started.
        # Approximation (as with hypothesis_prune): a subtree that would win
        # only after at_iters is lost — keep >= 2 covers close calls.
        prune = dict((self.config.get("parallel") or {}).get("part_prune") or {})
        _ai = prune.get("at_iters", 15)
        _kp = prune.get("keep", 2)
        _ai = _ai if isinstance(_ai, (list, tuple)) else [_ai]
        _kp = _kp if isinstance(_kp, (list, tuple)) else [_kp]
        if len(_ai) != len(_kp):
            raise ValueError(
                f"part_prune cascade length mismatch: at_iters {list(_ai)} vs "
                f"keep {list(_kp)} — both lists must pair up round-for-round")
        rounds = [(int(a), max(int(k), 1)) for a, k in zip(_ai, _kp)]
        do_prune = bool(prune.get("enabled")) and S_max > rounds[-1][1]

        # honest eval accounting across ALL prune phases (grab_stats reads
        # last_run_stats once per stage — a single-phase value would hide the
        # phase-1 tournament's device work)
        agg_stats: Dict[str, int] = {}

        def merge_stats(st):
            for k, v in st.items():
                if k in ("width", "lanes"):
                    agg_stats[k] = v
                else:
                    agg_stats[k] = agg_stats.get(k, 0) + v

        def pick_survivors(sc_row, orig_row, keep):
            """Stable best-score order, deduplicated by ORIGINAL subtree id
            (padding lanes descend bit-identically to their originals, so an
            unstable sort could keep a duplicate pair and degrade keep=2 to
            one distinct subtree)."""
            order = np.argsort(sc_row, kind="stable")
            chosen, seen = [], set()
            for i in order:
                oid = int(orig_row[i])
                if oid in seen:
                    continue
                seen.add(oid)
                chosen.append(int(i))
                if len(chosen) == keep:
                    break
            for i in order:  # fewer distinct subtrees than keep: pad with dups
                if len(chosen) == keep:
                    break
                if int(i) not in chosen:
                    chosen.append(int(i))
            return np.sort(np.asarray(chosen[:keep]))

        # frame-axis coarse-to-fine for the subtree tournament (same design
        # as the chamfer-stage cascade, Benchmarks.md round 5): tournament
        # rounds only have to RANK subtrees, so they can descend on every
        # s-th frame; the final full-convergence descent runs at whatever
        # the last round's stride hands it (upsampled to full frames when
        # strided).  Scalar or per-round list, default 1 (off).
        fs = prune.get("frame_stride", 1)
        fs = fs if isinstance(fs, (list, tuple)) else [fs] * len(rounds)
        if len(fs) != len(rounds):
            raise ValueError(
                f"part_prune frame_stride {list(fs)} must be a scalar or "
                f"match the cascade length {len(rounds)}")
        fstrides = [max(int(s), 1) for s in fs]
        _LANE_F_KEYS = ("markers", "marker_weights", "o_pose_body",
                        "root_orient0", "foot_contacts", "frame_valid")

        def _lane_stride(ln, s):
            if s == 1:
                return ln
            return {k: (v[:, ::s] if k in _LANE_F_KEYS else v) for k, v in ln.items()}

        def _trans_restride(t, from_s, to_s):
            if from_s == to_s:
                return t
            if from_s > 1:
                t = upsample_frames(t, F, from_s)
            return t[:, ::to_s] if to_s > 1 else t

        sub_ids = np.tile(np.arange(S_max), (Q, 1))  # padded lane index
        S_cur = S_max
        evals_per_seq = np.zeros(Q, np.int64)
        scores_rows = np.full((Q, S_max), np.inf)  # best-known score per subtree
        tick("setup", lane["markers"])
        p_stride = 1
        if do_prune:
            done_iters = 0
            for (at_iters, keep), r_stride in zip(rounds, fstrides):
                if S_cur <= keep:
                    continue
                if p_stride != r_stride:
                    params0 = dict(params0)
                    params0["trans"] = _trans_restride(
                        params0["trans"], p_stride, r_stride)
                    p_stride = r_stride
                lane_r = _lane_stride(lane, r_stride)
                self._solver.iter_cap = max(at_iters - done_iters, 1)
                try:
                    p_opt, res = self._solver.run(params0, lane_r, {})
                finally:
                    self._solver.iter_cap = None
                merge_stats(self._solver.last_run_stats)
                done_iters = at_iters
                evals_per_seq += np.asarray(res.num_evals).reshape(Q, S_cur).sum(axis=1)
                tick("descend_prune", p_opt["z"])
                sc = np.asarray(self._score_lanes_any(
                    p_opt["z"], p_opt["betas"], p_opt["trans"], lane_r["vertex_mask"],
                    lane_r["markers"], lane_r["marker_weights"], lane_r["o_pose_body"],
                    lane_r["root_orient0"],
                )).reshape(Q, S_cur)
                tick("score_prune")
                for q in range(Q):
                    scores_rows[q, sub_ids[q]] = sc[q]
                local = np.stack([
                    pick_survivors(sc[q], lane_orig[q, sub_ids[q]], keep)
                    for q in range(Q)
                ])
                sub_ids = np.take_along_axis(sub_ids, local, axis=1)
                surv = jnp.asarray((np.arange(Q)[:, None] * S_cur + local).reshape(-1))
                params0 = {k: v[surv] for k, v in p_opt.items()}
                lane = {k: v[surv] for k, v in lane.items()}
                S_cur = keep
                tick("survivor_gather", lane["markers"])
        if p_stride > 1:  # final descent runs at full frames
            params0 = dict(params0)
            params0["trans"] = _trans_restride(params0["trans"], p_stride, 1)

        p_opt, res = self._solver.run(params0, lane, {})
        merge_stats(self._solver.last_run_stats)
        self._solver.last_run_stats = agg_stats
        evals_per_seq += np.asarray(res.num_evals).reshape(Q, S_cur).sum(axis=1)
        tick("descend_final", p_opt["z"])

        scores_l = self._score_lanes_any(
            p_opt["z"], p_opt["betas"], p_opt["trans"], lane["vertex_mask"],
            lane["markers"], lane["marker_weights"], lane["o_pose_body"],
            lane["root_orient0"],
        )
        sc_final = np.asarray(scores_l).reshape(Q, S_cur)
        tick("score_final")
        for q in range(Q):
            scores_rows[q, sub_ids[q]] = sc_final[q]
        scores = scores_rows  # [Q, S_max] — survivors carry final scores,
        # pruned lanes their last tournament score (stale by construction)

        best_local = np.argmin(sc_final, axis=1)  # [Q] index into survivors
        best = sub_ids[np.arange(Q), best_local]  # [Q] padded lane index
        sel = jnp.asarray(np.arange(Q) * S_cur + best_local)
        labels_b, best_root_b = self._relabel_q(
            markers_b, p_opt["z"][sel], p_opt["betas"][sel], p_opt["trans"][sel],
            o_pose_body_b, root_orient0_b,
        )
        tick("relabel", labels_b)

        results = []
        for q in range(Q):
            subtrees = per_seq[q][1]
            row = scores[q]
            # confidence ratio from SURVIVOR (converged) scores when possible:
            # pruned lanes' stale phase-1 scores are systematically less
            # converged (higher) and would inflate the 2nd-distinct value
            uniq = np.unique(np.round(sc_final[q], 12))
            if len(uniq) < 2:
                uniq = np.unique(np.round(row[np.isfinite(row)], 12))
            ratio = float(uniq[1] / uniq[0]) if len(uniq) > 1 else 0.0
            fitted_cols = np.asarray(jnp.max(marker_weights_b[q], axis=0) > 0)
            if int(fitted_cols.sum()) == 1:
                ratio = 0.0
            weights_out = jnp.broadcast_to(
                jnp.asarray(fitted_cols, markers_b.dtype)[None, :] * ratio, (F, M)
            )
            valid_rows = np.asarray(frame_valid_b[q]) > 0
            flat = np.asarray(markers_b[q])[valid_rows].reshape(-1, 3)
            sub = np.asarray(markers_b[q])[valid_rows][:, fitted_cols].reshape(-1, 3)
            aabb_ratio = get_aabb_volume(get_aabb(jnp.asarray(sub))) / jnp.maximum(
                get_aabb_volume(get_aabb(jnp.asarray(flat))), 1e-12
            )
            results.append(PartFitResult(
                params=SmplParams(
                    o_pose_body_b[q], p_opt["betas"][int(sel[q])], best_root_b[q],
                    p_opt["trans"][int(sel[q])],
                ),
                marker_labels=jnp.broadcast_to(labels_b[q][None], (F, M)),
                marker_weights=weights_out,
                chain=np.asarray(subtrees[int(lane_orig[q, best[q]])], np.int32),
                distance=jnp.asarray(row[int(best[q])]),
                aabb_volume_ratio=aabb_ratio,
                subtree_losses=jnp.asarray(row),
                lbfgs_evals=int(evals_per_seq[q]),
            ))
        tick("assemble")
        return results

    def __call__(
        self,
        markers: jnp.ndarray,  # [F, M, 3]
        marker_weights: jnp.ndarray,  # [F, M]
        o_pose_body: jnp.ndarray,  # [F, 23, 3, 3]
        o_betas: jnp.ndarray,  # [1, 10]
        root_orient0: jnp.ndarray,  # [F, 1, 3, 3]
        num_rigid_groups: int,
        foot_contacts: jnp.ndarray | None = None,  # [F, 2]
        frame_valid: jnp.ndarray | None = None,  # [F] bucket-padding mask
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
            "frame_valid": jnp.ones(F) if frame_valid is None else frame_valid,
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

        # confidence: 2nd-best / best subtree score, UNnormalized (the
        # reference normalizes by the max across all fitted chains at the end,
        # markers_utils.py:612-630 — the caller does that; with one chain the
        # two agree).  Zero when the chain covers a single marker (:618-619).
        uniq = np.unique(np.round(scores, 12))
        ratio = float(uniq[1] / uniq[0]) if len(uniq) > 1 else 0.0
        fitted_cols = np.asarray(jnp.max(marker_weights, axis=0) > 0)  # [M]
        if int(fitted_cols.sum()) == 1:
            ratio = 0.0
        weights_out = jnp.asarray(fitted_cols, markers.dtype)[None, :] * ratio
        weights_out = jnp.broadcast_to(weights_out, (F, M))

        # AABB volume of the fitted marker subset vs all markers (reference
        # markers_utils.py:590: markers_subset AABB / full AABB); the subset
        # is the columns with nonzero fit weight (all of them in cluster mode).
        # Bucket-padding frames (zeroed markers) are excluded from both.
        valid_rows = (
            np.asarray(frame_valid) > 0 if frame_valid is not None else np.ones(F, bool)
        )
        flat = np.asarray(markers)[valid_rows].reshape(-1, 3)
        sub = np.asarray(markers)[valid_rows][:, fitted_cols].reshape(-1, 3)
        aabb_ratio = get_aabb_volume(get_aabb(jnp.asarray(sub))) / jnp.maximum(
            get_aabb_volume(get_aabb(jnp.asarray(flat))), 1e-12
        )

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
