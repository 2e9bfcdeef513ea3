"""Multi-sequence batched solve — the production sharded sweep.

The reference's batch driver solves sequences one-by-one in a Python loop
(``test/test.py:50-147``) and, inside each solve, loops yaw hypotheses
sequentially (``multimodal.py:462-574``) and candidate subtrees sequentially
(``markers_utils.py:416``).  Here ALL of those axes become lanes of single
batched device programs (SURVEY.md §2.8, BASELINE.json config 5):

  * part fit:   lanes = sequence x candidate subtree (``PartFitter.fit_batch``)
  * chamfer:    lanes = sequence x yaw hypothesis
  * marker IK:  lanes = sequence x yaw hypothesis
  * refinement: lanes = sequence

Every stage runs through the SAME ``BatchedLbfgs`` programs as the
single-sequence solver (per-sequence tensors move from ``shared`` into
``lane`` — ``stages._data``), so batch results match the sequential solver
lane-for-lane; the accuracy-parity test pins this.

Sharding: lanes are independent minimizations, so the lane axis shards over
the mesh's ``data`` axis with NO collectives until the final per-sequence
argmin over hypothesis scores (A scalars per sequence).  Lane repacking
re-applies the sharding after each compaction.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.geometry import get_aabb, get_aabb_volume, get_marker_mask
from uuo_mocap_tpu.pipeline.multimodal import PreparedSequence, _params_to_stage_dict
from uuo_mocap_tpu.pipeline.part_fit import PartFitter
from uuo_mocap_tpu.pipeline.segmentation import segment_rigid
from uuo_mocap_tpu.pipeline.stages import SmplParams, SolveStages, _forward


def make_lane_resharder(mesh: Mesh):
    """Place every leaf of a lane-batched pytree sharded on axis 0 over the
    mesh's ``data`` axis (replicated when the lane count does not divide it
    — small repacked tail buckets)."""
    n_data = int(mesh.shape["data"])

    def put(tree):
        def one(a):
            spec = P("data") if (a.ndim > 0 and a.shape[0] % n_data == 0) else P()
            return jax.device_put(a, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(one, tree)

    return put


class MultiSequenceSolver:
    """Solve a batch of same-shape sequences: the full staged pipeline with
    sequences, hypotheses, and subtrees as lanes of shared device programs,
    optionally sharded over a mesh."""

    def __init__(self, model: BodyModel, config: Dict[str, Any], mesh: Optional[Mesh] = None):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.stages = SolveStages(model, config)
        self.part_fitter = PartFitter(model, config)
        if mesh is not None:
            resharder = make_lane_resharder(mesh)
            for solver in (
                self.stages._chamfer_solver,
                self.stages._marker_solver,
                self.part_fitter._solver,
            ):
                solver.reshard = resharder

    def _put_lanes(self, *arrays):
        if self.mesh is None:
            return arrays
        put = make_lane_resharder(self.mesh)
        return tuple(put(a) for a in arrays)

    # ------------------------------------------------------------- full sweep
    def solve_prepared(
        self,
        preps: List[PreparedSequence],
        print_options: List[str] = [],
        save_stages: bool = False,
    ) -> Dict[str, Any]:
        """Full-pipeline batch solve of Q prepared sequences (the production
        form of ``multimodal_video_mocap`` — same stage schedule, same
        programs, lanes instead of loops).  All preps must share padded
        shapes [F, M] (``prepare_sequence(pad_to_frames=, pad_to_markers=)``).

        Returns {"results": [per-sequence output dict], "lbfgs_evals",
        "solve_time_s", "stage_times_s", "scores"}.

        The camera-reprojection stages are disabled in the shipped config
        (``num_iters: 0``) and need per-sequence camera streams that
        ``PreparedSequence`` does not carry — configs that enable them
        solve through the sequential path (``cli/test.py`` without
        ``--batch``).
        """
        t_start = time.time()
        cfg = self.config
        for st in ("reprojection_part", "reprojection_full"):
            if cfg["stages"][st]["num_iters"] > 0:
                raise NotImplementedError(
                    f"{st} needs the camera stream; use the sequential solver "
                    "(multimodal_video_mocap / cli.test without --batch) for this config"
                )
        if cfg["stages"]["part"].get("mode", "cluster") == "network":
            raise NotImplementedError(
                "network segmentation mode is sequential-only for now; "
                "use multimodal_video_mocap / cli.test without --batch"
            )
        model = self.model
        stages = self.stages
        progress = "progress" in print_options
        Q = len(preps)
        F = preps[0].F
        M = preps[0].markers.shape[1]
        for p in preps:
            if p.F != F or p.markers.shape[1] != M:
                raise ValueError(
                    f"batch shapes differ: ({p.F},{p.markers.shape[1]}) vs ({F},{M}); "
                    "pass pad_to_frames/pad_to_markers to prepare_sequence"
                )

        stage_times: Dict[str, float] = {}

        def timed(name):
            class _T:
                def __enter__(self):
                    self.t0 = time.time()

                def __exit__(self, *a):
                    stage_times[name] = stage_times.get(name, 0.0) + time.time() - self.t0

            return _T()

        def log(msg):
            if progress:
                print(msg)

        # ---- stack per-sequence tensors [Q, ...]
        markers_b = jnp.asarray(np.stack([p.markers for p in preps]))
        weights_b = get_marker_mask(markers_b)
        img_mask_b = jnp.asarray(np.stack([p.img_mask for p in preps]))
        frame_valid_b = jnp.asarray(np.stack([p.frame_valid for p in preps]))
        o_pose_b = jnp.asarray(np.stack([p.o_pose_body for p in preps]))
        o_root_b = jnp.asarray(np.stack([p.o_root_orient for p in preps]))
        o_trans_b = jnp.asarray(np.stack([p.o_trans for p in preps]))
        o_betas_b = jnp.asarray(np.stack([p.o_betas for p in preps]))
        o_fc_b = jnp.asarray(np.stack([p.o_foot_contacts for p in preps]))

        total_evals = 0

        # ---- marker segmentation per sequence (host, cheap; reference
        #      multimodal.py:217-230)
        log(f"Batch[{Q}]: rigid segmentation...")
        with timed("segment_rigid"):
            groups_per_seq = [segment_rigid(np.asarray(p.markers[: p.F_real])) for p in preps]
        marker_labels_b = np.zeros((Q, F, M), np.int64)
        for q, groups in enumerate(groups_per_seq):
            for gi, group in enumerate(groups):
                marker_labels_b[q, :, group] = gi

        # ---- AABB part-vs-full heuristic per sequence (multimodal.py:232-239)
        zero_params = SmplParams(
            o_pose_b.reshape(Q * F, 23, 3, 3),
            jnp.zeros((1, 10)),
            o_root_b.reshape(Q * F, 1, 3, 3),
            jnp.zeros((Q * F, 3)),
        )
        mean_vertices = _forward(model, zero_params)["vertices"].reshape(Q, F, -1, 3)
        # median over REAL frames only (bucket-padding zeros distort volumes)
        aabb_ratios = np.asarray([
            float(jnp.median(
                get_aabb_volume(get_aabb(markers_b[q, : preps[q].F_real]))
                / get_aabb_volume(get_aabb(mean_vertices[q, : preps[q].F_real]))
            ))
            for q in range(Q)
        ])

        # ---- part fitting, all sequences' subtree searches as one lane batch
        trans_seed = jnp.median(markers_b, axis=2)  # [Q, F, 3]
        root_seed = o_root_b
        betas_seed = o_betas_b
        chains: List[Optional[np.ndarray]] = [None] * Q
        if cfg["find_best_part_fits"]:
            log(f"Batch[{Q}]: part fit (lanes = sequence x subtree)...")
            fit_weights = jnp.ones_like(weights_b) * frame_valid_b[:, :, None]
            with timed("part_fit"):
                part_results = self.part_fitter.fit_batch(
                    markers_b, fit_weights, o_pose_b, o_betas_b, o_root_b,
                    num_rigid_groups=[len(g) for g in groups_per_seq],
                    foot_contacts_b=o_fc_b, frame_valid_b=frame_valid_b,
                )
            total_evals += sum(r.lbfgs_evals for r in part_results)
            marker_labels_b = np.stack([np.asarray(r.marker_labels) for r in part_results])
            root_seed = jnp.stack([r.params.root_orient for r in part_results])
            trans_seed = jnp.stack([r.params.trans for r in part_results])
            betas_seed = jnp.stack([r.params.betas for r in part_results])
            chains = [r.chain for r in part_results]

        # ---- full-body fallback per sequence (multimodal.py:372-375)
        fallback = (~np.asarray([cfg["find_best_part_fits"]] * Q)) | (aabb_ratios > 0.4)
        if fallback.any():
            fb = jnp.asarray(fallback)
            sel = lambda new, old: jnp.where(fb.reshape((Q,) + (1,) * (old.ndim - 1)), new, old)
            trans_seed = sel(jnp.median(markers_b, axis=2), trans_seed)
            root_seed = sel(o_root_b, root_seed)
            betas_seed = sel(o_betas_b, betas_seed)

        labels_mode_b = jnp.asarray(
            np.stack([
                np.apply_along_axis(lambda c: np.bincount(c).argmax(), 0, marker_labels_b[q])
                for q in range(Q)
            ])
        )  # [Q, M]

        # ---- root stage (disabled in the shipped config)
        if cfg["stages"]["root"]["num_iters"] > 0:
            log(f"Batch[{Q}]: root stage...")
            params_root, res_r = stages.root_stage_lanes(
                markers_b, weights_b, o_pose_b, o_betas_b,
                betas_seed, root_seed, trans_seed, labels_mode_b, frame_valid_b,
            )
            total_evals += int(np.sum(np.asarray(res_r.num_evals)))
            root_seed = params_root.root_orient
            trans_seed = params_root.trans
            betas_seed = params_root.betas

        # ---- chamfer + marker stages: lanes = sequence x yaw hypothesis
        A = int(cfg["num_root_orient_angles"])
        angles = jnp.asarray(np.arange(A) * 2 * np.pi / A, jnp.float32)
        Ln = Q * A
        log(f"Batch[{Q}]: chamfer+marker, {Ln} lanes ({Q} sequences x {A} hypotheses)...")

        # [Q, A, F, 1, 3, 3] -> [Q*A, F, 1, 3, 3], hypothesis-minor
        seed_roots = jax.jit(jax.vmap(jax.vmap(
            lambda angle, r: rot.normalize_rotation(
                rot.rot_z(jnp.broadcast_to(angle[None, None], (F, 1, 1))) @ r
            ),
            in_axes=(0, None)), in_axes=(None, 0)))
        root0_l = seed_roots(angles, root_seed).reshape(Ln, F, 1, 3, 3)

        def lane_rep(x):  # [Q, ...] -> [Q*A, ...] sequence-major
            return jnp.repeat(x, A, axis=0)

        markers_l, weights_l, o_pose_l, o_betas_l, fv_l = self._put_lanes(
            lane_rep(markers_b), lane_rep(weights_b), lane_rep(o_pose_b),
            lane_rep(o_betas_b), lane_rep(frame_valid_b),
        )
        labels_l = lane_rep(labels_mode_b)
        (root0_l,) = self._put_lanes(root0_l)

        do_chamfer = cfg["stages"]["chamfer"]["num_iters"] > 0
        do_marker = cfg["stages"]["marker"]["num_iters"] > 0

        if do_chamfer:
            with timed("chamfer"):
                chamfer_all, res_c = stages.chamfer_stage_lanes(
                    markers_l, weights_l, o_pose_l, o_betas_l,
                    o_pose_l, lane_rep(betas_seed), root0_l, lane_rep(trans_seed),
                    labels_l, fv_l,
                )
            total_evals += int(np.sum(np.asarray(res_c.num_evals)))
        else:
            chamfer_all = SmplParams(o_pose_l, lane_rep(betas_seed), root0_l, lane_rep(trans_seed))

        if do_marker:
            part_gran = cfg["stages"]["segment"]["granularity"] == "part"
            with timed("nearest"):
                if part_gran:
                    attach_all = stages.nearest_points_lanes(
                        markers_l, chamfer_all, lane_rep(img_mask_b), labels_l
                    )
                else:
                    attach_all = stages.nearest_points_lanes_nolabel(
                        markers_l, chamfer_all, lane_rep(img_mask_b)
                    )
                jax.block_until_ready(attach_all.vertex_ids)
            with timed("marker"):
                marker_all, res_m = stages.marker_stage_lanes(
                    markers_l, weights_l, o_pose_l, o_betas_l, chamfer_all, attach_all, fv_l,
                )
            total_evals += int(np.sum(np.asarray(res_m.num_evals)))
        else:
            marker_all = chamfer_all

        # ---- best hypothesis per sequence (multimodal.py:576-606)
        scores = np.asarray(
            stages.score_chamfer_lanes(markers_l, weights_l, marker_all)
        ).reshape(Q, A)
        best = np.argmin(scores, axis=1)  # [Q]
        sel_l = jnp.asarray(np.arange(Q) * A + best)
        params_q = jax.tree_util.tree_map(lambda x: x[sel_l], marker_all)
        chamfer_q = jax.tree_util.tree_map(lambda x: x[sel_l], chamfer_all)
        marker_q = params_q  # pre-refinement "marker" stage snapshot
        log(f"  best hypotheses: {best.tolist()}")

        # ---- final refinement repeats, lanes = sequence (multimodal.py:609-677)
        marker_labels_out = marker_labels_b
        if do_marker:
            part_gran = cfg["stages"]["segment"]["granularity"] == "part"
            for rep in range(int(cfg["stage_repeats"])):
                log(f"Batch[{Q}]: refinement {rep + 1}/{cfg['stage_repeats']}...")
                with timed("nearest_final"):
                    if part_gran:
                        attach_q = stages.nearest_points_lanes(
                            markers_b, params_q, img_mask_b, labels_mode_b
                        )
                    else:
                        attach_q = stages.nearest_points_lanes_nolabel(
                            markers_b, params_q, img_mask_b
                        )
                    jax.block_until_ready(attach_q.vertex_ids)
                if cfg.get("recompute_marker_labels"):
                    labels_np = []
                    for q in range(Q):
                        att = jax.tree_util.tree_map(lambda x: x[q], attach_q)
                        lab = np.asarray(stages.marker_labels_from_attachment(att, F))
                        if cfg["stages"]["segment"]["rigid_filter"]:
                            from uuo_mocap_tpu.pipeline.segmentation import filter_rigid

                            lab = filter_rigid(np.asarray(markers_b[q]), lab)
                        labels_np.append(lab)
                    marker_labels_out = np.stack(labels_np)
                with timed("marker_final"):
                    params_q, res_f = stages.marker_stage_lanes(
                        markers_b, weights_b, params_q.pose_body, o_betas_b,
                        params_q, attach_q, frame_valid_b,
                    )
                total_evals += int(np.sum(np.asarray(res_f.num_evals)))

        # ---- per-sequence output assembly (multimodal.py:679-710)
        results = []
        trans_np = np.asarray(params_q.trans)
        root_np = np.asarray(rot.normalize_rotation(params_q.root_orient))
        pose_np = np.asarray(rot.normalize_rotation(params_q.pose_body))
        betas_np = np.asarray(params_q.betas)
        for q in range(Q):
            Fr, Mr = preps[q].F_real, preps[q].M_real
            out: Dict[str, Any] = {}
            out["trans"] = trans_np[q, :Fr]
            out["root_orient"] = root_np[q, :Fr]
            out["pose_body"] = pose_np[q, :Fr]
            out["betas"] = np.broadcast_to(betas_np[q], (Fr, 10)).copy()
            out["mocap_frame_rate"] = preps[q].mocap_freq
            out["markers_labels"] = np.asarray(marker_labels_out[q])[:Fr, :Mr]
            out["best_hypothesis"] = int(best[q])
            if chains[q] is not None:
                out["chain"] = chains[q]
            if save_stages:
                stage_dicts = {}
                if cfg["find_best_part_fits"] and not fallback[q]:
                    stage_dicts["part"] = _params_to_stage_dict(SmplParams(
                        o_pose_b[q], betas_seed[q], root_seed[q], trans_seed[q]
                    ))
                if do_chamfer:
                    stage_dicts["chamfer"] = _params_to_stage_dict(
                        jax.tree_util.tree_map(lambda x: x[q], chamfer_q)
                    )
                if do_marker:
                    stage_dicts["marker"] = _params_to_stage_dict(
                        jax.tree_util.tree_map(lambda x: x[q], marker_q)
                    )
                    stage_dicts["marker_final"] = _params_to_stage_dict(
                        jax.tree_util.tree_map(lambda x: x[q], params_q)
                    )
                for sd in stage_dicts.values():
                    for key in ("trans", "root_orient", "pose_body"):
                        sd[key] = sd[key][:Fr]
                out["stages"] = stage_dicts
            results.append(out)

        dt = time.time() - t_start
        return {
            "results": results,
            "lbfgs_evals": total_evals,
            "solve_time_s": dt,
            "stage_times_s": {k: round(v, 2) for k, v in stage_times.items()},
            "scores": scores,
            "best_hypothesis": best,
        }

    # ----------------------------------------------- compat core-stage sweep
    def solve(
        self,
        markers: jnp.ndarray,  # [S, F, M, 3]
        weights: jnp.ndarray,  # [S, F, M]
        o_pose_body: jnp.ndarray,  # [S, F, 23, 3, 3]
        o_betas: jnp.ndarray,  # [S, 1, 10]
        root_orient0: jnp.ndarray,  # [S, F, 1, 3, 3]
        trans0: jnp.ndarray,  # [S, F, 3]
        img_mask: Optional[jnp.ndarray] = None,  # [S, F]
    ) -> Dict[str, Any]:
        """Core-stage sweep (chamfer -> correspondence -> marker IK -> best
        hypothesis) over S sequences without part-fit seeding — the direct
        lane-batched form of the per-hypothesis stages.  Use
        ``solve_prepared`` for the full pipeline."""
        stages = self.stages
        S, F, M = markers.shape[:3]
        A = int(self.config["num_root_orient_angles"])
        Ln = S * A
        angles = jnp.asarray(np.arange(A) * 2 * np.pi / A, jnp.float32)
        if img_mask is None:
            img_mask = jnp.ones((S, F))
        frame_valid = jnp.ones((S, F))

        seed_roots = jax.jit(jax.vmap(jax.vmap(
            lambda angle, r: rot.normalize_rotation(
                rot.rot_z(jnp.broadcast_to(angle[None, None], (F, 1, 1))) @ r
            ),
            in_axes=(0, None)), in_axes=(None, 0)))
        root0_l = seed_roots(angles, root_orient0).reshape(Ln, F, 1, 3, 3)

        def lane_rep(x):
            return jnp.repeat(x, A, axis=0)

        markers_l, weights_l, o_pose_l, o_betas_l, fv_l = self._put_lanes(
            lane_rep(markers), lane_rep(weights), lane_rep(o_pose_body),
            lane_rep(o_betas), lane_rep(frame_valid),
        )
        (root0_l,) = self._put_lanes(root0_l)
        labels_l = jnp.zeros((Ln, M), jnp.int64)

        chamfer_all, res_c = stages.chamfer_stage_lanes(
            markers_l, weights_l, o_pose_l, o_betas_l,
            o_pose_l, lane_rep(o_betas), root0_l, lane_rep(trans0), labels_l, fv_l,
        )
        attach_all = stages.nearest_points_lanes_nolabel(
            markers_l, chamfer_all, lane_rep(img_mask)
        )
        marker_all, res_m = stages.marker_stage_lanes(
            markers_l, weights_l, o_pose_l, o_betas_l, chamfer_all, attach_all, fv_l,
        )

        scores = np.asarray(
            stages.score_chamfer_lanes(markers_l, weights_l, marker_all)
        ).reshape(S, A)
        best = np.argmin(scores, axis=1)
        sel_l = jnp.asarray(np.arange(S) * A + best)
        result = jax.tree_util.tree_map(lambda x: x[sel_l], marker_all)
        return {
            "params": result,
            "scores": scores,
            "best_hypothesis": best,
            "lbfgs_evals": int(
                np.sum(np.asarray(res_c.num_evals)) + np.sum(np.asarray(res_m.num_evals))
            ),
        }
