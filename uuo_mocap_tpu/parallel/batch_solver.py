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
argmin over hypothesis scores (A scalars per sequence).  The streaming
driver re-applies the sharding after each working-set refill.

Streaming widths (``config["parallel"]``): device programs run a FIXED lane
width (``lane_width``, default 16 — the largest width validated stable on a
single v5e chip; 32-wide chamfer programs crash the TPU worker, see
Benchmarks.md) and any number of lanes stream through them with
refill-on-retire (``solver/lbfgs.py``).  One program shape per stage
compiles regardless of batch size.
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
from uuo_mocap_tpu.ops.geometry import (
    get_aabb, get_aabb_volume, get_marker_mask, upsample_frames as _upsample_frames)
from uuo_mocap_tpu.pipeline.multimodal import PreparedSequence, _params_to_stage_dict
from uuo_mocap_tpu.pipeline.part_fit import PartFitter
from uuo_mocap_tpu.pipeline.segmentation import segment_rigid
from uuo_mocap_tpu.pipeline.stages import SmplParams, SolveStages, _forward


def chunked_lanes(fn, width: Optional[int], *args):
    """Run a jit(vmap) lane program in ``width``-sized slices (tail padded by
    clamping to the last lane) so ONE canonical compiled shape serves any
    lane count — the one-shot analog of the streaming L-BFGS driver."""
    L = jax.tree_util.tree_leaves(args[0])[0].shape[0]
    if width is None or L <= int(width):
        return fn(*args)
    W = int(width)
    outs = []
    for s in range(0, L, W):
        idx = jnp.asarray(np.clip(np.arange(s, s + W), 0, L - 1))
        outs.append(fn(*[
            jax.tree_util.tree_map(lambda a: a[idx], arg) for arg in args
        ]))
    return jax.tree_util.tree_map(lambda *cs: jnp.concatenate(cs, axis=0)[:L], *outs)


def upsample_lane_params(params: SmplParams, F_full: int, stride: int) -> SmplParams:
    """Warm-start upsampling for the frame-strided tournament (coarse-to-
    fine): linear interp for trans (and betas when frame-broadcast),
    blend+re-orthonormalize for rotations."""
    betas = params.betas
    if betas.ndim >= 3:  # [Ln, F_s, 10] frame-broadcast layout
        betas = _upsample_frames(betas, F_full, stride)
    return SmplParams(
        pose_body=rot.normalize_rotation(_upsample_frames(params.pose_body, F_full, stride)),
        betas=betas,
        root_orient=rot.normalize_rotation(
            _upsample_frames(params.root_orient, F_full, stride)),
        trans=_upsample_frames(params.trans, F_full, stride),
    )


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
        if mesh is not None and int(mesh.shape.get("model", 1)) > 1:
            # genuine tensor parallelism for the vertex dimension: the body
            # model's [V, ...] tensors are device_put sharded over the mesh's
            # 'model' axis, and every stage closure closes over them — GSPMD
            # propagates the vertex sharding through the LBS forward and the
            # chamfer min-over-V (which completes with an ICI collective)
            # in the SAME production programs the lane axis runs through
            from uuo_mocap_tpu.parallel.mesh import _shard_model_by_vertex

            model = _shard_model_by_vertex(model, mesh)
        self.model = model
        self.config = config
        self.mesh = mesh
        self.stages = SolveStages(model, config)
        self.part_fitter = PartFitter(model, config)
        if mesh is not None:
            # exported AOT programs carry no sharding annotations; under a
            # mesh the stage programs must stay plain jit so GSPMD sees the
            # NamedSharding-placed inputs (solver/aot.py)
            self.stages._aot.enabled = False
            self.part_fitter._aot.enabled = False
        pcfg = config.get("parallel") or {}
        # lane_width DEFAULTS to 16 — the largest program width validated
        # stable on this chip (32-wide L-BFGS chamfer programs crash the TPU
        # worker, Benchmarks.md); without a default the CLI --batch path
        # would compile crash-width programs for batches > 4 sequences.
        # pad_width defaults OFF here so small batches (tests, --batch 2)
        # keep their natural program shapes; bench.py opts in for canonical
        # width reuse across batch sizes.
        self.lane_width = int(pcfg.get("lane_width", 16))
        self._pad_width = bool(pcfg.get("pad_width", False))
        if self.lane_width:
            for solver in (self.stages._chamfer_solver, self.stages._marker_solver,
                           self.stages._root_solver):
                solver.max_width = int(self.lane_width)
                solver.pad_width = self._pad_width
        # hypothesis pruning (opt-in, parallel.hypothesis_prune): stop
        # descending yaw-hypothesis lanes that lost the tournament — see
        # solve_prepared's chamfer block
        self.prune_cfg = dict(pcfg.get("hypothesis_prune") or {})
        # default 16, same cap as the chamfer lanes: the 64 default shipped
        # rounds 2-4 was never exercised past 8 live lanes — the first
        # network-mode run at production scale (2026-08-20) put a wide
        # subtree batch through the part L-BFGS program and killed the TPU
        # worker, the same failure band as docs/tpu_worker_crash_width32.md.
        # Wider sets stream through 16-wide segments like every other stage.
        part_w = int(pcfg.get("part_lane_width", 16))
        if part_w:
            self.part_fitter._solver.max_width = part_w
            self.part_fitter._solver.pad_width = self._pad_width
        self._reproj = None  # lazily-built ReprojectionStage
        # jitted prior forward — the eager op-by-op LBS costs hundreds of
        # tiny per-op XLA compiles on the tunneled TPU backend.  AOT-wrapped:
        # the [Q*F]-frame dense forward is the largest NON-stage program of a
        # solve, and its per-process trace+lower showed up as unattributed
        # warmup wall (the stage programs were already cached)
        self._jit_forward = self.stages._aot.wrap(
            "model_forward", jax.jit(lambda p: _forward(self.model, p))
        )
        if mesh is not None:
            resharder = make_lane_resharder(mesh)
            for solver in (
                self.stages._chamfer_solver,
                self.stages._marker_solver,
                self.part_fitter._solver,
            ):
                solver.reshard = resharder

    @property
    def _seed_roots(self):
        """Cached yaw-hypothesis root seeding program (a per-call jax.jit
        here would re-trace on every solve — host tax)."""
        fn = getattr(self, "_seed_roots_fn", None)
        if fn is None:
            fn = jax.jit(jax.vmap(jax.vmap(
                lambda angle, r: rot.normalize_rotation(
                    rot.rot_z(jnp.broadcast_to(angle[None, None],
                                               (r.shape[0], 1, 1))) @ r
                ),
                in_axes=(0, None)), in_axes=(None, 0)))
            self._seed_roots_fn = fn
        return fn

    def _configure_solver(self, solver):
        """Apply the sweep's width/pad/reshard settings to a lazily-built
        stage solver (the prune phase-1 frozen chamfer solver is only
        constructed when a pruned sweep actually runs)."""
        if self.lane_width:
            solver.max_width = int(self.lane_width)
            solver.pad_width = self._pad_width
        if self.mesh is not None:
            solver.reshard = make_lane_resharder(self.mesh)

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

        Camera-reprojection stages run as sequence x angle lanes using the
        camera streams ``PreparedSequence`` carries; sequences whose
        ``ImgSmpl`` had no HMR detections (all-zero bbox) have no camera and
        raise a ValueError if the config enables reprojection.
        """
        t_start = time.time()
        cfg = self.config
        do_reproj_part = (
            cfg["find_best_part_fits"] and cfg["stages"]["reprojection_part"]["num_iters"] > 0
        )
        do_reproj_full = cfg["stages"]["reprojection_full"]["num_iters"] > 0
        if (do_reproj_part or do_reproj_full) and not all(p.has_camera for p in preps):
            raise ValueError(
                "reprojection stages need HMR camera streams; prepare_sequence "
                "found none on at least one sequence (synthetic ImgSmpl priors "
                "carry no camera data)"
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
        eval_stats: Dict[str, Dict[str, int]] = {}

        def grab_stats(name, solver):
            st = dict(solver.last_run_stats)
            if not st:
                return
            if name in eval_stats:
                cur = eval_stats[name]
                for k, v in st.items():
                    if k in ("width", "lanes"):  # shape facts, not additive
                        cur[k] = v
                    else:
                        cur[k] = cur.get(k, 0) + v
            else:
                eval_stats[name] = st

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
        #      multimodal.py:217-230): rigid clustering or the neural
        #      segmenter (network mode, ``markers_utils.py:34-76``) — the
        #      per-sequence inference is host-side either way, feeding the
        #      same lane pipeline
        part_mode = cfg["stages"]["part"].get("mode", "cluster")
        marker_labels_b = np.zeros((Q, F, M), np.int64)
        fit_mask_b = None  # [Q, M] network mode: restrict fits to the chain's markers
        if part_mode == "network":
            from uuo_mocap_tpu.pipeline.segmentation import (
                chains_from_labels,
                merge_symmetric_labels,
                segment_markers_network,
            )

            log(f"Batch[{Q}]: network segmentation...")
            num_fit_groups = []
            fit_mask_b = np.zeros((Q, M), np.float32)
            with timed("segment_network"):
                for q, p in enumerate(preps):
                    prior_out = self._jit_forward(SmplParams(
                        o_pose_b[q], o_betas_b[q], o_root_b[q], o_trans_b[q]
                    ))
                    labels_q = segment_markers_network(
                        np.asarray(p.markers), p.mocap_freq,
                        checkpoint_root=cfg.get("checkpoints_dir", "./checkpoints"),
                        joints=np.asarray(prior_out["joints"][:, :22]),
                    )
                    merged = merge_symmetric_labels(
                        np.apply_along_axis(lambda c: np.bincount(c).argmax(), 0, labels_q)
                    )
                    chains_q = chains_from_labels(merged, model.parents)
                    largest = chains_q[0]
                    num_fit_groups.append(len(largest))
                    fit_mask_b[q] = np.isin(merged, largest).astype(np.float32)
                    marker_labels_b[q] = labels_q
        else:
            log(f"Batch[{Q}]: rigid segmentation...")
            with timed("segment_rigid"):
                groups_per_seq = [segment_rigid(np.asarray(p.markers[: p.F_real])) for p in preps]
            for q, groups in enumerate(groups_per_seq):
                for gi, group in enumerate(groups):
                    marker_labels_b[q, :, group] = gi
            num_fit_groups = [len(g) for g in groups_per_seq]

        # ---- AABB part-vs-full heuristic per sequence (multimodal.py:232-239)
        zero_params = SmplParams(
            o_pose_b.reshape(Q * F, 23, 3, 3),
            jnp.zeros((1, 10)),
            o_root_b.reshape(Q * F, 1, 3, 3),
            jnp.zeros((Q * F, 3)),
        )
        with timed("aabb"):
            mean_vertices = self._jit_forward(zero_params)["vertices"].reshape(Q, F, -1, 3)
            # median over REAL frames only (bucket-padding zeros distort volumes)
            aabb_ratios = np.asarray([
                float(jnp.median(
                    get_aabb_volume(get_aabb(markers_b[q, : preps[q].F_real]))
                    / get_aabb_volume(get_aabb(mean_vertices[q, : preps[q].F_real]))
                ))
                for q in range(Q)
            ])

        # ---- camera-aware rotational alignment BEFORE the part fit
        #      (multimodal.py:253-335): lanes = sequence x angle
        if do_reproj_part:
            log(f"Batch[{Q}]: reprojection_part (lanes = sequence x angle)...")
            nA = int(cfg["stages"]["reprojection_part"]["num_angles"])
            criterion = cfg["stages"]["reprojection_part"].get("criterion", "reprojection")
            with timed("reprojection_part"):
                r_betas, r_root, r_trans = self._reprojection_lanes(
                    preps, nA, "reproject" if criterion == "reprojection" else "chamfer",
                    markers_b, weights_b, o_pose_b, o_betas_b,
                    jnp.median(markers_b, axis=2), img_mask_b,
                )
            o_betas_b = r_betas
            o_root_b = r_root
            o_trans_b = r_trans

        # ---- part fitting, all sequences' subtree searches as one lane batch
        trans_seed = jnp.median(markers_b, axis=2)  # [Q, F, 3]
        root_seed = o_root_b
        betas_seed = o_betas_b
        chains: List[Optional[np.ndarray]] = [None] * Q
        if cfg["find_best_part_fits"]:
            log(f"Batch[{Q}]: part fit (lanes = sequence x subtree)...")
            fit_weights = jnp.ones_like(weights_b) * frame_valid_b[:, :, None]
            if fit_mask_b is not None:  # network mode: only the chain's markers
                fit_weights = fit_weights * jnp.asarray(fit_mask_b)[:, None, :]
            with timed("part_fit"):
                part_results = self.part_fitter.fit_batch(
                    markers_b, fit_weights, o_pose_b, o_betas_b, o_root_b,
                    num_rigid_groups=num_fit_groups,
                    foot_contacts_b=o_fc_b, frame_valid_b=frame_valid_b,
                )
            total_evals += sum(r.lbfgs_evals for r in part_results)
            grab_stats("part_fit", self.part_fitter._solver)
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

        # ---- full-body reprojection alignment (multimodal.py:378-431)
        if do_reproj_full:
            log(f"Batch[{Q}]: reprojection_full (lanes = sequence x angle)...")
            nA = int(cfg["stages"]["reprojection_full"]["num_angles"])
            with timed("reprojection_full"):
                rf_betas, rf_root, rf_trans = self._reprojection_lanes(
                    preps, nA, "reproject",
                    markers_b, weights_b, o_pose_b, betas_seed,
                    trans_seed, img_mask_b,
                )
            betas_seed = rf_betas
            root_seed = rf_root
            trans_seed = rf_trans

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
        root0_l = self._seed_roots(angles, root_seed).reshape(Ln, F, 1, 3, 3)

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
        # SDF mode co-optimizes virtual marker positions through the learned
        # nets — dispatched per lane exactly like the sequential path
        # (stages.marker_stage_batched -> marker_stage_sdf)
        if cfg["stages"]["marker"].get("use_sdf"):
            self._configure_solver(stages._marker_solver_sdf)
            marker_lanes = stages.marker_stage_sdf_lanes
        else:
            marker_lanes = stages.marker_stage_lanes

        img_mask_l = lane_rep(img_mask_b)
        W = self.lane_width
        A_eff = A  # hypotheses still alive per sequence
        hyp_ids = np.tile(np.arange(A), (Q, 1))  # [Q, A_eff] original angle id
        pose0_l, betas0_l, trans0_l = o_pose_l, lane_rep(betas_seed), lane_rep(trans_seed)

        if do_chamfer:
            # hypothesis pruning (opt-in, parallel.hypothesis_prune): the
            # reference descends every yaw hypothesis to convergence and only
            # THEN holds the tournament (multimodal.py:462-599).  Losing
            # lanes (e.g. the upside-down yaw) burn the most iterations while
            # contributing nothing.  Pruning splits the chamfer stage:
            # phase 1 partially descends ALL lanes (iter_cap = at_iters,
            # host-side — the same compiled programs), scores them with the
            # SAME single-directional chamfer the final argmin uses, and
            # phase 2 descends only the best `keep` lanes per sequence to
            # convergence, warm-started from their phase-1 parameters.
            # Approximation: a lane that would have won only after at_iters
            # is lost — keep >= 2 covers close calls (measured: Benchmarks.md).
            prune = self.prune_cfg
            # at_iters/keep accept scalars (one tournament round) or equal-
            # length lists (a CASCADE: e.g. at_iters [50, 150], keep [2, 1]
            # retires the obviously-lost lanes after 50 iters and holds the
            # close-call runoff at 150, saving phase-1 device iterations on
            # lanes a single late tournament would have carried to 150).
            _ai = prune.get("at_iters", 150)
            _kp = prune.get("keep", 1)
            _ai = _ai if isinstance(_ai, (list, tuple)) else [_ai]
            _kp = _kp if isinstance(_kp, (list, tuple)) else [_kp]
            if len(_ai) != len(_kp):
                raise ValueError(
                    f"hypothesis_prune cascade length mismatch: at_iters "
                    f"{list(_ai)} vs keep {list(_kp)} — both lists must pair "
                    "up round-for-round")
            rounds = [(int(a), max(int(k), 1)) for a, k in zip(_ai, _kp)]
            do_prune = bool(prune.get("enabled")) and A > rounds[-1][1]
            if do_prune:
                # phase 1 only has to RANK lanes — hypothesis_prune.rank_phase1
                # opts it into the rank-per-iteration closure (~40% cheaper
                # evals).  OFF by default: although survivors re-descend under
                # the exact per-evaluation objective in phase 2, the frozen-
                # rank warm start can land them in a worse basin
                # (tests/test_hypothesis_prune.py measured +11 mm at toy
                # scale) — enable only after measuring on the target workload.
                if (bool(prune.get("rank_phase1", False))
                        and not self.config["optimizer"].get("rank_per_iteration", False)):
                    solver = stages._chamfer_solver_frozen
                    self._configure_solver(solver)
                else:
                    solver = stages._chamfer_solver
                # frame-axis coarse-to-fine (VERDICT r4 item 3): the phase-1
                # tournament only has to RANK yaw hypotheses, and with shared
                # betas + smooth pose the chamfer objective is well-
                # conditioned under frame subsampling — tournament rounds
                # can descend on every s-th frame (cost per eval ~1/s).
                # ``frame_stride`` is a scalar or a per-round list: the
                # measured-best cascade ([2, 1] at the default 50,150/2,1
                # rounds) strides only the early cull and runs the runoff at
                # full frames, so the phase-2 warm start never crosses an
                # upsampling boundary (an all-strided cascade drifted one
                # official sequence +2.3 mm — Benchmarks.md round 5).
                fs = prune.get("frame_stride", 1)
                fs = fs if isinstance(fs, (list, tuple)) else [fs] * len(rounds)
                if len(fs) != len(rounds):
                    raise ValueError(
                        f"hypothesis_prune frame_stride {list(fs)} must be a scalar "
                        f"or match the cascade length {len(rounds)}")
                strides = [max(int(s), 1) for s in fs]

                def _sl(x, s):  # stride the frame axis (dim 1) when present
                    if s > 1 and hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == F:
                        return x[:, ::s]
                    return x

                def _params_to_stride(p, from_s, to_s):
                    """Re-sample warm-start params between round strides."""
                    if from_s == to_s:
                        return p
                    if from_s > 1:  # back to full frames first
                        p = upsample_lane_params(p, F, from_s)
                    if to_s > 1:
                        p = SmplParams(*(_sl(x, to_s) for x in p))
                    return p

                A_cur = A
                done_iters = 0
                p_stride = 1  # stride the warm-start params currently live at
                for (at_iters, keep), r_stride in zip(rounds, strides):
                    if A_cur <= keep:
                        continue
                    round_iters = max(at_iters - done_iters, 1)
                    log(f"Batch[{Q}]: chamfer phase 1 ({Ln} lanes, "
                        f"+{round_iters} iters to {at_iters}"
                        + (f", frame stride {r_stride}" if r_stride > 1 else "") + ")...")
                    if p_stride != r_stride:
                        p = _params_to_stride(
                            SmplParams(pose0_l, betas0_l, root0_l, trans0_l),
                            p_stride, r_stride)
                        pose0_l, betas0_l, trans0_l = p.pose_body, p.betas, p.trans
                        (root0_l,) = self._put_lanes(p.root_orient)
                        p_stride = r_stride
                    mk_s, wt_s, op_s, ob_s, fv_s = (
                        _sl(markers_l, r_stride), _sl(weights_l, r_stride),
                        _sl(o_pose_l, r_stride), _sl(o_betas_l, r_stride),
                        _sl(fv_l, r_stride))
                    with timed("chamfer"):
                        solver.iter_cap = round_iters
                        try:
                            partial_all, res_p = stages.chamfer_stage_lanes(
                                mk_s, wt_s, op_s, ob_s,
                                pose0_l, betas0_l, root0_l, trans0_l, labels_l, fv_s,
                                solver=solver,
                            )
                        finally:
                            solver.iter_cap = None
                    done_iters = at_iters
                    total_evals += int(np.sum(np.asarray(res_p.num_evals)))
                    grab_stats("chamfer", solver)
                    with timed("prune_score"):
                        pscores = np.asarray(chunked_lanes(
                            stages.score_chamfer_lanes, W,
                            mk_s, wt_s, partial_all,
                        )).reshape(Q, A_cur)
                    local = np.sort(np.argsort(pscores, axis=1)[:, :keep], axis=1)
                    hyp_ids = np.take_along_axis(hyp_ids, local, axis=1)
                    surv = jnp.asarray((np.arange(Q)[:, None] * A_cur + local).reshape(-1))
                    markers_l, weights_l, o_pose_l, o_betas_l, fv_l, img_mask_l = \
                        self._put_lanes(*(x[surv] for x in (
                            markers_l, weights_l, o_pose_l, o_betas_l, fv_l, img_mask_l)))
                    labels_l = labels_l[surv]
                    partial_s = jax.tree_util.tree_map(lambda a: a[surv], partial_all)
                    pose0_l = partial_s.pose_body
                    betas0_l = partial_s.betas
                    trans0_l = partial_s.trans
                    (root0_l,) = self._put_lanes(rot.normalize_rotation(partial_s.root_orient))
                    A_cur = keep
                    Ln = Q * keep
                if p_stride > 1:
                    # survivors re-enter full-frame phase 2 from upsampled params
                    up = upsample_lane_params(
                        SmplParams(pose0_l, betas0_l, root0_l, trans0_l), F, p_stride)
                    pose0_l, betas0_l, trans0_l = up.pose_body, up.betas, up.trans
                    (root0_l,) = self._put_lanes(up.root_orient)
                A_eff = A_cur
                log(f"  survivors {hyp_ids.tolist()}; chamfer phase 2 ({Ln} lanes)...")
            with timed("chamfer"):
                chamfer_all, res_c = stages.chamfer_stage_lanes(
                    markers_l, weights_l, o_pose_l, o_betas_l,
                    pose0_l, betas0_l, root0_l, trans0_l,
                    labels_l, fv_l,
                )
            total_evals += int(np.sum(np.asarray(res_c.num_evals)))
            grab_stats("chamfer", stages._chamfer_solver)
        else:
            chamfer_all = SmplParams(pose0_l, betas0_l, root0_l, trans0_l)

        if do_marker:
            part_gran = cfg["stages"]["segment"]["granularity"] == "part"
            with timed("nearest"):
                if part_gran:
                    attach_all = chunked_lanes(
                        stages.nearest_points_lanes, W,
                        markers_l, chamfer_all, img_mask_l, labels_l,
                    )
                else:
                    attach_all = chunked_lanes(
                        stages.nearest_points_lanes_nolabel, W,
                        markers_l, chamfer_all, img_mask_l,
                    )
                jax.block_until_ready(attach_all.vertex_ids)
            with timed("marker"):
                marker_all, res_m = marker_lanes(
                    markers_l, weights_l, o_pose_l, o_betas_l, chamfer_all, attach_all, fv_l,
                )
            total_evals += int(np.sum(np.asarray(res_m.num_evals)))
            grab_stats("marker", stages._marker_solver_sdf
                       if cfg["stages"]["marker"].get("use_sdf") else stages._marker_solver)
        else:
            marker_all = chamfer_all

        # ---- best hypothesis per sequence (multimodal.py:576-606)
        scores = np.asarray(chunked_lanes(
            stages.score_chamfer_lanes, W, markers_l, weights_l, marker_all
        )).reshape(Q, A_eff)
        best_local = np.argmin(scores, axis=1)  # [Q] index into surviving lanes
        best = hyp_ids[np.arange(Q), best_local]  # [Q] original angle id
        sel_l = jnp.asarray(np.arange(Q) * A_eff + best_local)
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
                        attach_q = chunked_lanes(
                            stages.nearest_points_lanes, W,
                            markers_b, params_q, img_mask_b, labels_mode_b,
                        )
                    else:
                        attach_q = chunked_lanes(
                            stages.nearest_points_lanes_nolabel, W,
                            markers_b, params_q, img_mask_b,
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
                    params_q, res_f = marker_lanes(
                        markers_b, weights_b, params_q.pose_body, o_betas_b,
                        params_q, attach_q, frame_valid_b,
                    )
                total_evals += int(np.sum(np.asarray(res_f.num_evals)))
                grab_stats("marker_final", stages._marker_solver_sdf
                           if cfg["stages"]["marker"].get("use_sdf") else stages._marker_solver)

        # ---- per-sequence output assembly (multimodal.py:679-710)
        t_asm = time.time()
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

        stage_times["assemble"] = stage_times.get("assemble", 0.0) + time.time() - t_asm
        dt = time.time() - t_start
        return {
            "results": results,
            "lbfgs_evals": total_evals,
            "solve_time_s": dt,
            "stage_times_s": {k: round(v, 2) for k, v in stage_times.items()},
            "eval_stats": eval_stats,
            "scores": scores,
            "best_hypothesis": best,
        }

    # ------------------------------------------------- reprojection lanes
    def _reprojection_lanes(self, preps, nA, metric_key, markers_b, weights_b,
                            o_pose_b, betas0_b, trans0_b, img_mask_b):
        """Multi-angle camera alignment for all sequences at once: lanes =
        sequence x angle through the vmapped reprojection program
        (``pipeline/reprojection.py``), chunked to the stable lane width.
        Returns per-sequence (betas [Q,1,10], root [Q,F,1,3,3], trans
        [Q,F,3]) of each sequence's best angle — the same selection the
        sequential path makes (``multimodal.py:253-335``)."""
        from uuo_mocap_tpu.pipeline.reprojection import ReprojectionStage

        if self._reproj is None:
            # the reference re-reads iters/losses from reprojection_part for
            # BOTH variants (multimodal.py:410)
            self._reproj = ReprojectionStage(self.model, self.config, "reprojection_part")
        Q = len(preps)
        angles = np.arange(nA) * 2 * np.pi / max(nA, 1)
        angles_l = jnp.asarray(np.tile(angles, Q), jnp.float32)  # sequence-major

        def lane_rep(x):
            return jnp.repeat(x, nA, axis=0)

        def cam(field):
            return jnp.asarray(np.stack([getattr(p, field) for p in preps]))

        out = chunked_lanes(
            self._reproj.lanes, self.lane_width,
            angles_l, lane_rep(markers_b), lane_rep(weights_b), lane_rep(o_pose_b),
            lane_rep(betas0_b), lane_rep(cam("hmr_betas")), lane_rep(cam("hmr_root_orient")),
            lane_rep(trans0_b), lane_rep(cam("camera_bbox")), lane_rep(cam("cam_center")),
            lane_rep(cam("cam_size")), lane_rep(cam("cam_scale")),
            lane_rep(img_mask_b),
        )
        met = np.asarray(out["metrics"][metric_key]).reshape(Q, nA)
        best = np.argmin(met, axis=1)
        sel = jnp.asarray(np.arange(Q) * nA + best)
        betas = jnp.mean(out["betas"][sel], axis=1)[:, None, :]  # [Q, 1, 10]
        return betas, out["root_orient"][sel], out["trans"][sel]

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

        root0_l = self._seed_roots(angles, root_orient0).reshape(Ln, F, 1, 3, 3)

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
