"""The three L-BFGS solve stages + marker-correspondence computation.

TPU-native re-design of the reference's ``optimization.py``:

  * ``optim_root``    (``optimization.py:21-144``)  -> ``root_stage``
  * ``optim_chamfer`` (``optimization.py:147-285``) -> ``chamfer_stage_batched``
  * ``optim_markers`` (``optimization.py:288-399``) -> ``marker_stage_batched``
  * ``compute_nearest_points`` (``optimization.py:402-642``) -> ``nearest_points``

Differences by design (not omissions):
  * every optimization runs through the segmented ``BatchedLbfgs`` driver:
    all yaw hypotheses advance in lockstep on one device program, in bounded
    iteration segments (no minutes-long single executions), with state held
    on device between segments — the whole stage never syncs parameters to
    host (SURVEY.md §7 hard part 1, §2.8);
  * rotations are optimized in the 6d parametrization directly instead of
    re-orthonormalizing raw 3x3s every closure (same manifold, fewer params);
  * ``compute_nearest_points``'s per-frame trimesh/igl host loop becomes the
    on-device scan of ``mean_nearest_vertex_over_frames`` / batched
    point-triangle kernels;
  * marker attachments are (vertex_ids[M,3], weights[M,3]) instead of a
    dense [M, 6890] one-hot — the reference's Sum(bc * vertices) contraction
    (``optimization.py:345-351``) becomes three gathers.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward, lbs_forward_at
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import (
    masked_chamfer,
    mean_nearest_vertex_over_frames,
    nearest_vertex,
    squared_distance_matrix,
)
from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance
from uuo_mocap_tpu.solver import losses as L
from uuo_mocap_tpu.solver.lbfgs import BatchedLbfgs, LbfgsOptions

# iterations per device call — bounds single-execution wall time
SEGMENT_SIZE = 50


class SmplParams(NamedTuple):
    """Per-sequence SMPL state passed between stages."""

    pose_body: jnp.ndarray  # [F, 23, 3, 3]
    betas: jnp.ndarray  # [1, 10]
    root_orient: jnp.ndarray  # [F, 1, 3, 3]
    trans: jnp.ndarray  # [F, 3]


class MarkerAttachment(NamedTuple):
    """Sparse marker->surface attachment: marker m sits at
    sum_k weights[m,k] * vertices[face_vertex_ids[m,k]]."""

    vertex_ids: jnp.ndarray  # [M, 3] int32
    weights: jnp.ndarray  # [M, 3]

    def to_one_hot(self, num_vertices: int) -> jnp.ndarray:
        """Dense [M, V] barycentric one-hot (API parity with the reference's
        ``barycentric_coords_one_hot``)."""
        M = self.vertex_ids.shape[0]
        oh = jnp.zeros((M, num_vertices), self.weights.dtype)
        rows = jnp.arange(M)[:, None].repeat(3, 1)
        return oh.at[rows, self.vertex_ids].add(self.weights)


def _stage_opts(config: Dict[str, Any], stage: str, lr_default: float = 1.0,
                lr_override: float | None = None) -> LbfgsOptions:
    scfg = config["stages"][stage]
    return LbfgsOptions(
        max_iter=int(scfg["num_iters"]),
        lr=lr_override if lr_override is not None else float(scfg.get("lr", lr_default)),
        tolerance_grad=float(config["optimizer"]["tolerance_grad"]),
        tolerance_change=float(config["optimizer"]["tolerance_change"]),
        history_size=int(config["optimizer"].get("history_size", 10)),
    )


def _data(lane, shared):
    """Merge lane/shared views: a tensor may arrive lane-batched (multi-
    sequence solve: every sequence is a lane) or broadcast (single-sequence
    solve: one copy shared by all hypothesis lanes).  Lane wins."""
    d = dict(shared)
    d.update(lane)
    return d


def _forward(model, params: SmplParams):
    F = params.trans.shape[0]
    betas = jnp.broadcast_to(params.betas, (F, 10))
    return lbs_forward(model, params.pose_body, betas, params.root_orient, params.trans)


_RANK_FRAME_CHUNK = 64  # frames per argmin step — bounds the [C, M, V] tile

# Frame-blocked Pallas ranking kernel (opt-in, UUO_RANK_PALLAS=1): one grid
# program per F_BLOCK frames keeps the [M, V_tile] distance product in
# VMEM/registers and amortizes launch overhead — the round-2 per-frame
# kernel was launch-bound at B~1800 (Benchmarks.md).  The ranking pass is
# ~8.4 ms of the 15 ms sparse closure, the single largest share.
_RANK_PALLAS = os.environ.get("UUO_RANK_PALLAS", "0") == "1"

# Ranking-pass precision (opt-in, UUO_RANK_PRECISION=highest|default|bf16).
# The ranking feeds a stop-gradient argmin and the loss value/gradient are
# computed exactly in f32 at the selected vertex (`_sparse_chamfer_at`), so
# a misrank costs the distance gap between the two candidate vertices — not
# numerical error in the objective.  MEASURED rank agreement vs HIGHEST on
# realistic synthetic geometry (F=64, M=41, markers ~1 cm off-surface):
#   * "bf16" (quantize centered clouds to bf16): 9.1% agreement — the bf16
#     rounding of the |y|^2 term (~1e-3 m^2) swamps the ~1e-5 m^2 gaps
#     between neighboring mesh vertices; picked vertices land a mean
#     13.6 mm (max 58 mm) from the true nearest.  DEAD for accuracy; the
#     toggle remains only to document the counter-result.
#   * "default" (f32 inputs, one-pass MXU cross term, exact f32 rank-1
#     terms): 34% agreement — and a measured e2e COUNTER-RESULT: the 66%
#     of flipped picks (7e-5 m^2 mean penalty) change the objective
#     inconsistently between L-BFGS evaluations, line searches
#     mis-terminate, and the official capture FAILS its accuracy gate
#     while running 35% slower (Benchmarks.md round 4).
#   * "high" (3-pass bf16_3x cross term): 99.4% agreement with flips only
#     on true near-ties (max penalty 2.7e-6 m^2); official capture matches
#     HIGHEST per-sequence MPJPE to 0.1 mm at −18% closure cost.  SHIPPED
#     DEFAULT (Benchmarks.md round-4 ranking-precision study).
_RANK_PRECISION = os.environ.get("UUO_RANK_PRECISION", "high")


def _ranked_nearest(markers, verts_ng, y_bias=None, table=None):
    """No-grad argmin vertex per marker, scanned over frame chunks so a
    possibly-materialized [F, M, V] distance tensor never exceeds
    [chunk, M, V] (~72 MB at the canonical shape) — many lanes of this run
    concurrently under vmap and an unchunked ranking OOMs the chip.

    ``table`` (a ``rank_hier.RankTable``) switches to the coarse-to-fine
    ranking — C + P*K distance work per (frame, marker) instead of V.
    Vertex-subset bias (part_fit's subtree masking) keeps the dense path:
    a cell's candidates can straddle the subset boundary."""
    if table is not None and y_bias is None:
        from uuo_mocap_tpu.ops.rank_hier import hierarchical_nearest

        return hierarchical_nearest(markers, verts_ng, table,
                                    frame_chunk=_RANK_FRAME_CHUNK)
    if _RANK_PALLAS:
        from uuo_mocap_tpu.ops.chamfer_pallas import (
            M_PAD, pallas_available, ranked_nearest_pallas,
        )

        if pallas_available() and markers.shape[1] <= M_PAD:
            return ranked_nearest_pallas(markers, verts_ng, y_bias)
    F = markers.shape[0]
    C = _RANK_FRAME_CHUNK

    def one(m_c, v_c):
        if _RANK_PRECISION == "bf16":
            d2 = squared_distance_matrix(
                m_c, v_c, precision=jax.lax.Precision.DEFAULT,
                compute_dtype=jnp.bfloat16)
        elif _RANK_PRECISION == "default":
            d2 = squared_distance_matrix(
                m_c, v_c, precision=jax.lax.Precision.DEFAULT)
        elif _RANK_PRECISION == "high":
            d2 = squared_distance_matrix(
                m_c, v_c, precision=jax.lax.Precision.HIGH)
        else:
            d2 = squared_distance_matrix(m_c, v_c)
        if y_bias is not None:
            d2 = d2 + y_bias[None, None, :].astype(d2.dtype)
        return jnp.argmin(d2, axis=-1)

    if F <= C:
        return one(markers, verts_ng)
    pad = (-F) % C
    K = (F + pad) // C

    def pad_r(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((K, C) + a.shape[1:])

    idx = jax.lax.map(lambda mv: one(*mv), (pad_r(markers), pad_r(verts_ng)))
    return idx.reshape(K * C, -1)[:F]


def _sparse_chamfer(model, sp: SmplParams, markers, weights, frame_valid=None,
                    table=None):
    """Single-directional weighted chamfer with an O(M) backward.

    Ranking runs on a stop-gradient dense forward (f32-exact argmin — same
    vertex the dense path selects); the differentiable value comes from the
    GATHERED forward ``lbs_forward_at`` at the selected vertices, so the
    cotangent never scatters into a [V, 3] buffer and the dense LBS never
    runs backward.  Value and gradient equal ``masked_chamfer`` of the dense
    forward (the custom VJP also holds the argmin fixed; measured grad
    agreement ~5e-9).  MEASURED: canonical 4x450x41x6890 closure fwd+bwd
    33.4 -> 15.0 ms.
    """
    sp_ng = jax.tree_util.tree_map(jax.lax.stop_gradient, sp)
    verts_ng = _forward(model, sp_ng)["vertices"]  # [F, V, 3], no grad
    idx = _ranked_nearest(markers, verts_ng, table=table)  # [F, M]
    return _sparse_chamfer_at(model, sp, markers, weights, idx)


def _sparse_chamfer_at(model, sp: SmplParams, markers, weights, idx):
    """The gathered-forward chamfer value at FIXED nearest-vertex ids —
    the differentiable half of ``_sparse_chamfer``, exposed separately so
    the rank-per-iteration mode (``optimizer.rank_per_iteration``) can
    reuse one ranking across all line-search evaluations of an L-BFGS
    step."""
    F = markers.shape[0]
    betas_b = jnp.broadcast_to(sp.betas, (F, 10))
    pts = lbs_forward_at(model, sp.pose_body, betas_b, sp.root_orient, sp.trans, idx)["points"]
    d2 = jnp.sum((markers - pts) ** 2, axis=-1)  # [F, M]
    w = weights.astype(markers.dtype)
    return jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1e-12)


# loss keys whose gradients need no dense vertex tensor — the sparse chamfer
# path is exact for stages whose active losses stay inside this set
_SPARSE_SAFE_LOSSES = {
    "full_chamfer", "reg_pose_body", "reg_betas", "trans_vel",
    "root_orient_vel", "temporal",
}


def virtual_markers_from_attachment(vertices: jnp.ndarray, attachment: MarkerAttachment) -> jnp.ndarray:
    """[F, V, 3] + attachment -> [F, M, 3] virtual marker positions."""
    return (
        attachment.weights[None, :, 0:1] * vertices[:, attachment.vertex_ids[:, 0]]
        + attachment.weights[None, :, 1:2] * vertices[:, attachment.vertex_ids[:, 1]]
        + attachment.weights[None, :, 2:3] * vertices[:, attachment.vertex_ids[:, 2]]
    )


class SolveStages:
    """Builds the solve-stage programs for a (model, config) pair.

    Construction is cheap; each stage's init/segment programs compile on
    first use and persist for every subsequent sequence of the same shape.
    """

    def __init__(self, model: BodyModel, config: Dict[str, Any]):
        self.model = model
        self.config = config
        self.vertex_labels = jnp.argmax(model.lbs_weights, axis=-1)  # [V]
        self.part_ids = jnp.arange(model.lbs_weights.shape[1])
        # persistent AOT program cache: skip per-process tracing/lowering of
        # the stage programs (solver/aot.py; round-3 bench: 824 s warmup for
        # a 53.5 s solve).  Config+model fingerprints key the entries (both
        # are baked into the programs as constants).
        from uuo_mocap_tpu.solver.aot import (
            AotCache, config_fingerprint, model_fingerprint, seed_model_consts)

        self._aot = AotCache(
            extra=config_fingerprint(config) + ":" + model_fingerprint(model))
        # let loaded AOT programs reuse the on-device model tensors instead
        # of re-uploading ~19 MB of hoisted constants over the tunnel
        seed_model_consts(model)

    # ------------------------------------------------------------------ root
    @functools.cached_property
    def _root_solver(self) -> BatchedLbfgs:
        cfg = self.config
        scfg = cfg["stages"]["root"]
        losses = scfg["losses"]
        model = self.model
        vertex_labels = self.vertex_labels
        part_ids = self.part_ids
        single_dir = bool(scfg["single_directional"])
        constrained = bool(scfg.get("constrained_rotation", False))
        yaw_lock = bool(scfg.get("yaw_lock", True))

        def apply_root(z, root_orient0):
            F = root_orient0.shape[0]
            if constrained:
                return rot.rot_z(jnp.broadcast_to(z, (F, 1, 1))) @ root_orient0
            if yaw_lock:
                return rot.rot_z(z) @ root_orient0
            return rot.rotation_6d_to_matrix(z)

        self._root_apply = apply_root

        def fun(p, lane, shared):
            d = _data(lane, shared)
            root_orient0 = d["root_orient0"]
            z_root = apply_root(p["z"], root_orient0)
            sp = SmplParams(d["o_pose_body"], p["betas"], z_root, p["trans"])
            out = _forward(model, sp)
            total = 0.0
            if "part_chamfer" in losses:
                total += losses["part_chamfer"] * L.part_chamfer_loss(
                    d["markers"], out["vertices"], d["marker_labels_mode"],
                    vertex_labels, part_ids, single_dir,
                )
            if "full_chamfer" in losses:
                total += losses["full_chamfer"] * L.full_chamfer_loss(
                    d["markers"], out["vertices"], d["weights"], single_dir
                )
            if "root_orient_vel" in losses:
                total += losses["root_orient_vel"] * L.root_orient_vel_loss(
                    z_root, root_orient0, d["frame_valid"])
            if "trans_vel" in losses:
                total += losses["trans_vel"] * L.trans_vel_loss(
                    p["trans"], d["markers"], d["frame_valid"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], d["o_betas"])
            if "ground" in losses:
                total += losses["ground"] * L.ground_loss_joints(out["joints"], d["frame_valid"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "root"), segment_size=SEGMENT_SIZE,
                            aot=self._aot, name="root")

    def root_stage(self, markers, weights, o_pose_body, betas0, root_orient0, trans0,
                   marker_labels_mode, o_betas, frame_valid=None):
        """Optimize {trans, yaw, betas}, pose fixed (reference ``optim_root``)."""
        F = trans0.shape[0]
        scfg = self.config["stages"]["root"]
        if scfg.get("constrained_rotation", False):
            z0 = jnp.zeros((1, 1, 1))
        elif scfg.get("yaw_lock", True):
            z0 = jnp.zeros((F, 1, 1))
        else:
            z0 = rot.matrix_to_rotation_6d(jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3)))
        params0 = {"trans": trans0[None], "z": z0[None], "betas": betas0[None]}
        lane = {"root_orient0": root_orient0[None]}
        shared = {
            "markers": markers, "weights": weights, "o_pose_body": o_pose_body,
            "o_betas": o_betas, "marker_labels_mode": marker_labels_mode,
            "frame_valid": jnp.ones(F) if frame_valid is None else frame_valid,
        }
        p_opt, res = self._root_solver.run(params0, lane, shared)
        z_root = self._root_apply(p_opt["z"][0], root_orient0)
        return SmplParams(o_pose_body, p_opt["betas"][0], z_root, p_opt["trans"][0]), res

    # --------------------------------------------------------------- chamfer
    @functools.cached_property
    def _chamfer_solver(self) -> BatchedLbfgs:
        return self._make_chamfer_solver(
            bool(self.config["optimizer"].get("rank_per_iteration", False))
        )

    @functools.cached_property
    def _chamfer_solver_frozen(self) -> BatchedLbfgs:
        """Rank-per-iteration chamfer solver regardless of the global
        ``optimizer.rank_per_iteration`` flag — used by hypothesis pruning's
        phase-1 partial descent (opt-in ``hypothesis_prune.rank_phase1``),
        where the objective only has to RANK lanes.  Survivors re-descend
        under the exact per-evaluation objective in phase 2, but the frozen-
        rank warm start can still land them in a worse basin (measured
        +11 mm at toy scale, tests/test_hypothesis_prune.py) — measure on
        the target workload before enabling."""
        return self._make_chamfer_solver(True)

    def _make_chamfer_solver(self, rank_per_iteration: bool) -> BatchedLbfgs:
        cfg = self.config
        scfg = cfg["stages"]["chamfer"]
        losses = scfg["losses"]
        model = self.model
        vertex_labels = self.vertex_labels
        part_ids = self.part_ids
        single_dir = bool(scfg["single_directional"])
        yaw_lock = bool(scfg.get("yaw_lock", True))

        def apply_root(z, root_orient0):
            if yaw_lock:
                return rot.rot_z(z) @ root_orient0
            return rot.rotation_6d_to_matrix(z)

        self._chamfer_apply = apply_root
        # sparse-gradient path: exact when every active loss avoids dense
        # vertex tensors (the shipped config: full_chamfer + regs)
        sparse = single_dir and set(losses) <= _SPARSE_SAFE_LOSSES
        # hierarchical coarse-to-fine ranking (optimizer.rank_hier /
        # UUO_RANK_HIER=1): MEASURED COUNTER-RESULT — argmin agreement is
        # ~0.9999 but the candidate gathers run 40x slower than the dense
        # fused distance+argmin (tools/bench_rank.py, Benchmarks.md round 3);
        # kept opt-in for documentation, default OFF.
        hier = os.environ.get("UUO_RANK_HIER")
        use_hier = (hier == "1") if hier is not None else bool(
            cfg["optimizer"].get("rank_hier", False))
        table = None
        if sparse and use_hier:
            from uuo_mocap_tpu.ops.rank_hier import rank_table_for

            table = rank_table_for(model)
        # rank-freeze (optimizer.rank_per_iteration): compute the nearest-
        # vertex ranking once per L-BFGS iteration instead of once per
        # line-search evaluation — the dense no-grad forward + argmin is the
        # dominant share of the closure, and line searches average ~2.5
        # evaluations per iteration.  At convergence the ranking is
        # stationary, so the fixed point matches the per-eval objective's.
        rank_freeze = sparse and rank_per_iteration

        def params_to_smpl(p, d):
            z_root = apply_root(p["z"], d["root_orient0"])
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            return SmplParams(pose, p["betas"], z_root, p["trans"])

        def prepare(p, lane, shared):
            d = _data(lane, shared)
            sp = params_to_smpl(p, d)
            verts = _forward(model, sp)["vertices"]  # no grad: aux path
            return _ranked_nearest(d["markers"], verts)

        def fun(p, lane, shared, idx=None):
            d = _data(lane, shared)
            root_orient0 = d["root_orient0"]
            z_root = apply_root(p["z"], root_orient0)
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            sp = SmplParams(pose, p["betas"], z_root, p["trans"])
            total = 0.0
            if sparse:
                if "full_chamfer" in losses:
                    if idx is not None:
                        total += losses["full_chamfer"] * _sparse_chamfer_at(
                            model, sp, d["markers"], d["weights"], idx)
                    else:
                        total += losses["full_chamfer"] * _sparse_chamfer(
                            model, sp, d["markers"], d["weights"], table=table)
            else:
                out = _forward(model, sp)
                if "part_chamfer" in losses:
                    total += losses["part_chamfer"] * L.part_chamfer_loss(
                        d["markers"], out["vertices"], d["marker_labels_mode"],
                        vertex_labels, part_ids, single_dir,
                    )
                if "full_chamfer" in losses:
                    total += losses["full_chamfer"] * L.full_chamfer_loss(
                        d["markers"], out["vertices"], d["weights"], single_dir
                    )
                if "ground" in losses:
                    total += losses["ground"] * L.ground_loss_joints(out["joints"], d["frame_valid"])
            if "root_orient_vel" in losses:
                total += losses["root_orient_vel"] * L.root_orient_vel_loss(
                    z_root, root_orient0, d["frame_valid"])
            if "reg_pose_body" in losses:
                total += losses["reg_pose_body"] * L.mse(pose, d["o_pose_body"])
            if "trans_vel" in losses:
                total += losses["trans_vel"] * L.trans_vel_loss(
                    p["trans"], d["markers"], d["frame_valid"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], d["o_betas"])
            return total

        # the reference hard-codes lr=0.1 for this stage (optimization.py:181).
        # NOTE: no lane_chunk here — per-eval memory is already bounded by
        # the frame-chunked ranking (_ranked_nearest), and the lax.map-
        # grouped variant of this program crashed the TPU worker at 32 lanes
        # (compile blow-up of map x vmap x nested while_loops).
        return BatchedLbfgs(fun, _stage_opts(cfg, "chamfer", lr_override=0.1),
                            segment_size=SEGMENT_SIZE,
                            prepare=prepare if rank_freeze else None,
                            aot=self._aot,
                            name="chamfer_rpi" if rank_per_iteration else "chamfer")

    def chamfer_stage_batched(self, markers, weights, o_pose_body, o_betas,
                              pose0, betas0, root0_batch, trans0, marker_labels_mode,
                              frame_valid=None):
        """All A yaw hypotheses at once: optimize {trans, yaw, betas, pose}
        per lane (reference ``optim_chamfer`` over its sequential angle loop).

        root0_batch [A, F, 1, 3, 3]; pose0/betas0/trans0 shared seeds.
        Returns (SmplParams with leading A axis, result)."""
        A, F = root0_batch.shape[0], root0_batch.shape[1]
        scfg = self.config["stages"]["chamfer"]
        pose6d0 = rot.matrix_to_rotation_6d(pose0)
        if scfg.get("yaw_lock", True):
            z0 = jnp.zeros((F, 1, 1))
        else:
            z0 = rot.matrix_to_rotation_6d(jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3)))

        def tile(x):
            return jnp.broadcast_to(x[None], (A,) + x.shape)

        params0 = {"trans": tile(trans0), "z": tile(z0), "betas": tile(betas0), "pose6d": tile(pose6d0)}
        lane = {"root_orient0": root0_batch}
        shared = {
            "markers": markers, "weights": weights, "o_pose_body": o_pose_body,
            "o_betas": o_betas, "marker_labels_mode": marker_labels_mode,
            "frame_valid": jnp.ones(F) if frame_valid is None else frame_valid,
        }
        p_opt, res = self._chamfer_solver.run(params0, lane, shared)
        return self._post_chamfer(p_opt, root0_batch), res

    # ----------------------------------------------------- nearest points
    @functools.cached_property
    def _nearest_points_fn(self):
        cfg = self.config
        loc_cfg = cfg["stages"]["compute_locations"]
        use_mean = bool(loc_cfg["use_mean"])
        use_barycentric = bool(loc_cfg["use_barycentric"])
        granularity = cfg["stages"]["segment"]["granularity"]
        model = self.model

        num_parts = int(self.model.lbs_weights.shape[1])

        def masked_median(values, mask):
            """Median of ``values`` where mask>0 (masked entries pushed to
            +inf and the median index halved accordingly)."""
            big = jnp.asarray(1e10, values.dtype)
            n = jnp.sum(mask > 0)
            sorted_vals = jnp.sort(jnp.where(mask > 0, values, big))
            mid_hi = jnp.maximum((n - 1) // 2 + (n - 1) % 2, 0)
            mid_lo = jnp.maximum((n - 1) // 2, 0)
            return 0.5 * (sorted_vals[mid_lo] + sorted_vals[mid_hi])

        def run(markers, params: SmplParams, img_mask, marker_labels_mode=None):
            """Marker->surface correspondence (reference
            ``compute_nearest_points``, ``optimization.py:402-642``).

            Default config path (use_mean): argmin vertex of the
            frame-averaged [M, V] distance matrix over img_mask frames.
            Barycentric path: closest surface point per frame, best frame
            selected per granularity (full: frame with min mean distance;
            marker: per-marker best frame; part: per-part best frame by
            median marker distance, reference ``optimization.py:571-578``).
            """
            F = params.trans.shape[0]
            mean_betas = jnp.mean(jnp.broadcast_to(params.betas, (F, 10)), axis=0, keepdims=True)
            sp = SmplParams(params.pose_body, mean_betas, params.root_orient, params.trans)
            out = _forward(model, sp)
            vertices = out["vertices"]  # [F, V, 3]

            if use_mean:
                vid = mean_nearest_vertex_over_frames(markers, vertices, img_mask)  # [M]
                ids = jnp.stack([vid, vid, vid], axis=-1).astype(jnp.int32)
                w = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], markers.dtype), ids.shape)
                return MarkerAttachment(ids, w)

            faces = jnp.asarray(model.faces)

            if use_barycentric:
                def per_frame(carry, inp):
                    m_f, v_f = inp
                    pm = point_mesh_distance(m_f, v_f, faces)
                    return carry, (pm["distance"], pm["face_index"], pm["barycentric"])

                _, (dist, face_idx, bary) = jax.lax.scan(per_frame, None, (markers, vertices))
            else:
                def per_frame(carry, inp):
                    m_f, v_f = inp
                    d2, vid = nearest_vertex(m_f, v_f)
                    return carry, (jnp.sqrt(d2 + 1e-18), vid)

                _, (dist, vid) = jax.lax.scan(per_frame, None, (markers, vertices))
                face_idx = None
                bary = None

            big = jnp.asarray(1e10, dist.dtype)
            dist_masked = jnp.where(img_mask[:, None] > 0, dist, big)

            if granularity == "marker":
                best_f = jnp.argmin(dist_masked, axis=0)  # [M]
            elif granularity == "part" and marker_labels_mode is not None:
                # per part: best frame by the median distance of the part's
                # markers in that frame; markers inherit their part's frame
                def per_part(pid):
                    pmask = (marker_labels_mode == pid).astype(dist.dtype)  # [M]
                    med = jax.vmap(lambda d: masked_median(d, pmask))(dist_masked)  # [F]
                    has = jnp.sum(pmask) > 0
                    return jnp.where(has, jnp.argmin(med), 0)

                part_best = jax.vmap(per_part)(jnp.arange(num_parts))  # [P]
                best_f = part_best[jnp.clip(marker_labels_mode, 0, num_parts - 1)]
            else:  # "full"
                best_f = jnp.argmin(jnp.mean(dist_masked, axis=1))
                best_f = jnp.broadcast_to(best_f, (markers.shape[1],))

            m_idx = jnp.arange(markers.shape[1])
            if use_barycentric:
                fsel = face_idx[best_f, m_idx]  # [M]
                ids = faces[fsel].astype(jnp.int32)  # [M, 3]
                w = bary[best_f, m_idx]  # [M, 3]
            else:
                vsel = vid[best_f, m_idx]
                ids = jnp.stack([vsel, vsel, vsel], axis=-1).astype(jnp.int32)
                w = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], markers.dtype), ids.shape)
            return MarkerAttachment(ids, w)

        return run

    @functools.cached_property
    def nearest_points(self):
        return self._aot.wrap("nearest_points", jax.jit(self._nearest_points_fn))

    @functools.cached_property
    def nearest_points_batched(self):
        run = self._nearest_points_fn
        return self._aot.wrap("nearest_points_batched", jax.jit(
            jax.vmap(lambda m, p, im, lbl: run(m, p, im, lbl), in_axes=(None, 0, None, None))))

    # ---------------------------------------------------------------- marker
    @functools.cached_property
    def _marker_solver(self) -> BatchedLbfgs:
        cfg = self.config
        losses = cfg["stages"]["marker"]["losses"]
        model = self.model

        def fun(p, lane, shared):
            d = _data(lane, shared)
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            root = rot.rotation_6d_to_matrix(p["root6d"])
            F = d["markers"].shape[0]
            M = d["att_ids"].shape[0]
            # the marker IK touches only the 3M attachment vertices — the
            # gathered forward never builds (or backpropagates through) the
            # dense [V, 3] cloud (see _sparse_chamfer)
            betas_b = jnp.broadcast_to(p["betas"], (F, 10))
            pts = lbs_forward_at(
                model, pose, betas_b, root, p["trans"], d["att_ids"].reshape(-1)
            )["points"].reshape(F, M, 3, 3)  # [F, m, k, coord]
            virtual = jnp.einsum("fmkd,mk->fmd", pts, d["att_w"])
            total = 0.0
            if "marker" in losses:
                total += losses["marker"] * L.marker_loss(d["markers"], virtual, d["weights"])
            if "reg_pose_body" in losses:
                total += losses["reg_pose_body"] * L.mse(pose, d["o_pose_body"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], d["o_betas"])
            if "temporal" in losses:
                total += losses["temporal"] * L.temporal_loss(pose, d["frame_valid"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "marker"), segment_size=SEGMENT_SIZE,
                            aot=self._aot, name="marker")

    @functools.cached_property
    def _marker_solver_sdf(self) -> BatchedLbfgs:
        """use_sdf variant: virtual marker POSITIONS are free parameters,
        converted to soft vertex assignments by the learned SDF nets every
        evaluation (reference ``optim_markers`` with ``use_sdf``,
        ``optimization.py:307-351``)."""
        cfg = self.config
        losses = cfg["stages"]["marker"]["losses"]
        model = self.model

        from uuo_mocap_tpu.models.sdf import SDF

        sdf = SDF(model, checkpoint_root=cfg.get("checkpoints_dir", "./checkpoints"))
        self._sdf = sdf

        def fun(p, lane, shared):
            d = _data(lane, shared)
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            root = rot.rotation_6d_to_matrix(p["root6d"])
            sp = SmplParams(pose, p["betas"], root, p["trans"])
            out = _forward(model, sp)
            bc = sdf.points_to_barycentric_one_hot(p["virtual_points"])  # [M, V]
            virtual = jnp.einsum("mv,fvd->fmd", bc, out["vertices"])
            total = 0.0
            if "marker" in losses:
                total += losses["marker"] * L.marker_loss(d["markers"], virtual, d["weights"])
            if "reg_pose_body" in losses:
                total += losses["reg_pose_body"] * L.mse(pose, d["o_pose_body"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], d["o_betas"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "marker"), segment_size=SEGMENT_SIZE,
                            aot=self._aot, name="marker_sdf")

    @functools.cached_property
    def _seed_virtual(self):
        """[A]-batched attachment -> virtual point seeds on the template."""
        self._marker_solver_sdf  # noqa: B018 — binds self._sdf
        sdf = self._sdf
        num_vertices = self.model.num_vertices

        def seed_points(att):
            oh = MarkerAttachment(att.vertex_ids, att.weights).to_one_hot(num_vertices)
            return sdf.barycentric_one_hot_to_points(oh)

        return jax.jit(jax.vmap(seed_points))

    def marker_stage_sdf(self, markers, weights, o_pose_body, o_betas,
                         params_batch: SmplParams, attachments: MarkerAttachment,
                         frame_valid=None):
        """SDF-mode marker IK: seed virtual points from the attachments on
        the template and co-optimize them with the body parameters."""
        solver = self._marker_solver_sdf
        A = params_batch.trans.shape[0]

        virtual0 = self._seed_virtual(attachments)
        params0 = dict(self._to6d(params_batch))
        params0["virtual_points"] = virtual0
        shared = {"markers": markers, "weights": weights,
                  "o_pose_body": o_pose_body, "o_betas": o_betas,
                  "frame_valid": jnp.ones(markers.shape[0]) if frame_valid is None else frame_valid}
        lane = {"_": jnp.zeros((A, 1))}
        p_opt, res = solver.run(params0, lane, shared)
        return self._post_marker(p_opt), res

    def marker_stage_batched(self, markers, weights, o_pose_body, o_betas,
                             params_batch: SmplParams, attachments: MarkerAttachment,
                             frame_valid=None):
        """Marker IK for all A hypotheses: optimize {pose, betas, root, trans}
        against per-lane virtual markers (reference ``optim_markers``).

        Dispatches to the SDF variant when ``marker.use_sdf`` is set.
        params_batch has leading A axis; attachments batched likewise."""
        if self.config["stages"]["marker"].get("use_sdf"):
            return self.marker_stage_sdf(
                markers, weights, o_pose_body, o_betas, params_batch, attachments,
                frame_valid=frame_valid,
            )
        params0 = self._to6d(params_batch)
        lane = {"att_ids": attachments.vertex_ids, "att_w": attachments.weights}
        shared = {
            "markers": markers, "weights": weights,
            "o_pose_body": o_pose_body, "o_betas": o_betas,
            "frame_valid": jnp.ones(markers.shape[0]) if frame_valid is None else frame_valid,
        }
        p_opt, res = self._marker_solver.run(params0, lane, shared)
        return self._post_marker(p_opt), res

    # ---------------------------------------------------- multi-sequence lanes
    # The same BatchedLbfgs instances serve the multi-sequence sweep: every
    # per-sequence tensor moves from ``shared`` into ``lane`` (the loss funs
    # read through the merged view), so S sequences x A hypotheses become
    # S*A independent lanes of the SAME stage programs.  This is the
    # production form of the reference's sequential sweep
    # (``test/test.py:50-147``) per SURVEY.md §2.8.

    def root_stage_lanes(self, markers_l, weights_l, o_pose_l, o_betas_l,
                         betas0_l, root0_l, trans0_l, labels_l, frame_valid_l):
        """Per-lane root optimization (multi-sequence form of ``root_stage``)."""
        Ln, F = root0_l.shape[0], root0_l.shape[1]
        scfg = self.config["stages"]["root"]
        solver = self._root_solver  # also binds self._root_apply
        if scfg.get("constrained_rotation", False):
            z0 = jnp.zeros((Ln, 1, 1, 1))
        elif scfg.get("yaw_lock", True):
            z0 = jnp.zeros((Ln, F, 1, 1))
        else:
            z0 = jnp.broadcast_to(
                rot.matrix_to_rotation_6d(jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3)))[None],
                (Ln, F, 1, 6),
            )
        params0 = {"trans": trans0_l, "z": z0, "betas": betas0_l}
        lane = {
            "root_orient0": root0_l, "markers": markers_l, "weights": weights_l,
            "o_pose_body": o_pose_l, "o_betas": o_betas_l,
            "marker_labels_mode": labels_l, "frame_valid": frame_valid_l,
        }
        p_opt, res = solver.run(params0, lane, {})
        return self._post_root(p_opt, root0_l, o_pose_l), res

    def chamfer_stage_lanes(self, markers_l, weights_l, o_pose_l, o_betas_l,
                            pose0_l, betas0_l, root0_l, trans0_l, labels_l,
                            frame_valid_l, solver=None):
        """Per-lane chamfer stage: every arg carries a leading lane axis
        (lane = sequence x yaw hypothesis).  ``solver`` overrides the stage
        solver (hypothesis pruning passes ``_chamfer_solver_frozen`` for its
        phase-1 partial descent)."""
        Ln, F = root0_l.shape[0], root0_l.shape[1]
        scfg = self.config["stages"]["chamfer"]
        if solver is None:
            solver = self._chamfer_solver  # binds self._chamfer_apply
        else:
            self._chamfer_solver  # noqa: B018 — ensure _chamfer_apply is bound
        pose6d0 = rot.matrix_to_rotation_6d(pose0_l)
        if scfg.get("yaw_lock", True):
            z0 = jnp.zeros((Ln, F, 1, 1))
        else:
            z0 = jnp.broadcast_to(
                rot.matrix_to_rotation_6d(jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3)))[None],
                (Ln, F, 1, 6),
            )
        params0 = {"trans": trans0_l, "z": z0, "betas": betas0_l, "pose6d": pose6d0}
        lane = {
            "root_orient0": root0_l, "markers": markers_l, "weights": weights_l,
            "o_pose_body": o_pose_l, "o_betas": o_betas_l,
            "marker_labels_mode": labels_l, "frame_valid": frame_valid_l,
        }
        p_opt, res = solver.run(params0, lane, {})
        return self._post_chamfer(p_opt, root0_l), res

    def marker_stage_lanes(self, markers_l, weights_l, o_pose_l, o_betas_l,
                           params_l: SmplParams, attachments_l: MarkerAttachment,
                           frame_valid_l):
        """Per-lane marker IK (multi-sequence form of ``marker_stage_batched``)."""
        params0 = self._to6d(params_l)
        lane = {
            "att_ids": attachments_l.vertex_ids, "att_w": attachments_l.weights,
            "markers": markers_l, "weights": weights_l,
            "o_pose_body": o_pose_l, "o_betas": o_betas_l,
            "frame_valid": frame_valid_l,
        }
        p_opt, res = self._marker_solver.run(params0, lane, {})
        return self._post_marker(p_opt), res

    def marker_stage_sdf_lanes(self, markers_l, weights_l, o_pose_l, o_betas_l,
                               params_l: SmplParams, attachments_l: MarkerAttachment,
                               frame_valid_l):
        """Per-lane SDF-mode marker IK (multi-sequence form of
        ``marker_stage_sdf``, signature-compatible with
        ``marker_stage_lanes`` so the batched sweep dispatches on
        ``marker.use_sdf`` exactly like the sequential path,
        reference ``optimization.py:288-399`` with ``utils/sdf.py:47-85``)."""
        solver = self._marker_solver_sdf
        params0 = dict(self._to6d(params_l))
        params0["virtual_points"] = self._seed_virtual(attachments_l)
        lane = {
            "markers": markers_l, "weights": weights_l,
            "o_pose_body": o_pose_l, "o_betas": o_betas_l,
            "frame_valid": frame_valid_l,
        }
        p_opt, res = solver.run(params0, lane, {})
        return self._post_marker(p_opt), res

    @functools.cached_property
    def nearest_points_lanes(self):
        run = self._nearest_points_fn
        return self._aot.wrap("nearest_points_lanes",
                              jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0))))

    @functools.cached_property
    def nearest_points_lanes_nolabel(self):
        run = self._nearest_points_fn
        return self._aot.wrap("nearest_points_lanes_nolabel", jax.jit(
            jax.vmap(lambda m, p, im: run(m, p, im, None), in_axes=(0, 0, 0))))

    @functools.cached_property
    def score_chamfer_lanes(self):
        run = self._score_chamfer_fn
        return self._aot.wrap("score_chamfer_lanes",
                              jax.jit(jax.vmap(run, in_axes=(0, 0, 0))))

    # ---- shared parameter-conversion programs (cached: per-call jax.jit
    #      closures re-trace on every stage invocation — pure host tax)
    @functools.cached_property
    def _to6d(self):
        return jax.jit(jax.vmap(lambda sp: {
            "pose6d": rot.matrix_to_rotation_6d(sp.pose_body),
            "betas": sp.betas,
            "root6d": rot.matrix_to_rotation_6d(sp.root_orient),
            "trans": sp.trans,
        }))

    @functools.cached_property
    def _post_marker(self):
        return jax.jit(jax.vmap(lambda p: SmplParams(
            rot.rotation_6d_to_matrix(p["pose6d"]), p["betas"],
            rot.rotation_6d_to_matrix(p["root6d"]), p["trans"],
        )))

    @functools.cached_property
    def _post_chamfer(self):
        return jax.jit(jax.vmap(lambda p, r0: SmplParams(
            rot.rotation_6d_to_matrix(p["pose6d"]), p["betas"],
            self._chamfer_apply(p["z"], r0), p["trans"],
        )))

    @functools.cached_property
    def _post_root(self):
        return jax.jit(jax.vmap(lambda p, r0, op: SmplParams(
            op, p["betas"], self._root_apply(p["z"], r0), p["trans"],
        )))

    # ------------------------------------------------------------ selection
    @functools.cached_property
    def _score_chamfer_fn(self):
        model = self.model

        def run(markers, marker_weights, params: SmplParams):
            """Final single-directional weighted chamfer used to pick the best
            yaw hypothesis (reference ``multimodal.py:576-599``)."""
            out = _forward(model, params)
            return masked_chamfer(markers, out["vertices"], marker_weights, single_directional=True)

        return run

    @functools.cached_property
    def score_chamfer(self):
        return self._aot.wrap("score_chamfer", jax.jit(self._score_chamfer_fn))

    @functools.cached_property
    def score_chamfer_batched(self):
        run = self._score_chamfer_fn
        return self._aot.wrap("score_chamfer_batched",
                              jax.jit(jax.vmap(run, in_axes=(None, None, 0))))

    def marker_labels_from_attachment(self, attachment: MarkerAttachment, num_frames: int) -> jnp.ndarray:
        """Part label per marker from its attachment vertex (reference
        ``compute_marker_labels_from_coords``, ``optimization.py:645-659``)."""
        labels = self.vertex_labels[attachment.vertex_ids[:, 0]]  # [M]
        return jnp.broadcast_to(labels[None], (num_frames, labels.shape[0]))
