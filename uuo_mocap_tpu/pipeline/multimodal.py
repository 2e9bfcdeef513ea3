"""The staged multimodal solver — orchestration.

TPU-native re-design of the reference's ``multimodal_video_mocap``
(``multimodal.py:38-710``).  Same stage schedule and data contracts, but:

  * the per-yaw-hypothesis loop (``multimodal.py:462-574``) is ONE vmapped
    program over a hypothesis axis (chamfer -> correspondence -> marker IK
    for all A angles at once);
  * the subtree-fit loop is the padded vmapped batch in ``part_fit``;
  * every stage is a jitted L-BFGS program (no per-iteration host sync);
  * host work is limited to one-time preprocessing (rigid clustering,
    resampling bookkeeping) and stage sequencing.

Output dict keys match the reference (``multimodal.py:679-710``):
``trans, root_orient, pose_body, betas, mocap_frame_rate, mocap_markers,
markers_labels, stages{part, root, chamfer, marker, marker_final}, chain``.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.geometry import get_aabb, get_aabb_volume, get_marker_mask
from uuo_mocap_tpu.pipeline.part_fit import PartFitter
from uuo_mocap_tpu.pipeline.segmentation import segment_rigid
from uuo_mocap_tpu.pipeline.stages import SmplParams, SolveStages, _forward


def resample_smpl_stream(
    trans: np.ndarray,  # [F, 3]
    root_orient: np.ndarray,  # [F, 1, 3, 3]
    pose_body: np.ndarray,  # [F, 23, 3, 3]
    foot_contacts: np.ndarray,  # [F, 2]
    src_freq: float,
    dst_freq: float,
):
    """Resample the HMR stream video-freq -> mocap-freq: lerp vectors, slerp
    rotations (reference ``multimodal.py:145-182``)."""
    if src_freq == dst_freq:
        return trans, root_orient, pose_body, foot_contacts
    F = trans.shape[0]
    new_F = round(F * (dst_freq / src_freq))
    pos = np.arange(new_F) * (src_freq / dst_freq)
    i0 = np.minimum(pos.astype(np.int64), F - 1)
    i1 = np.minimum(i0 + 1, F - 1)
    alpha = (pos - i0).astype(np.float32)
    a1 = alpha[:, None]
    trans_r = trans[i0] * (1 - a1) + trans[i1] * a1
    fc_r = foot_contacts[i0] * (1 - a1) + foot_contacts[i1] * a1
    a_rot = alpha[:, None, None]
    root_r = np.asarray(rot.matrix_slerp(jnp.asarray(root_orient[i0]), jnp.asarray(root_orient[i1]), a_rot))
    pose_r = np.asarray(rot.matrix_slerp(jnp.asarray(pose_body[i0]), jnp.asarray(pose_body[i1]), a_rot))
    return trans_r, root_r, pose_r, fc_r


def pad_stream(x: np.ndarray, offset: int) -> np.ndarray:
    """Temporal-offset padding: positive offset prepends copies of the first
    frame, negative appends the last (reference ``multimodal.py:713-726``)."""
    if offset == 0:
        return x
    if offset > 0:
        pad = np.repeat(x[:1], offset, axis=0)
        return np.concatenate([pad, x], axis=0)
    pad = np.repeat(x[-1:], -offset, axis=0)
    return np.concatenate([x, pad], axis=0)


def _params_to_stage_dict(params: SmplParams) -> Dict[str, np.ndarray]:
    return {
        "trans": np.asarray(params.trans),
        "root_orient": np.asarray(rot.normalize_rotation(params.root_orient)),
        "betas": np.asarray(params.betas)[0],
        "pose_body": np.asarray(rot.normalize_rotation(params.pose_body)),
    }


class PreparedSequence:
    """Host-preprocessed inputs of one sequence: resampled/slerped prior
    streams, offset-padded + frame-bucketed marker cloud, validity masks.
    All arrays are numpy; ``F`` includes bucket padding, ``F_real`` is the
    true frame count.  Shared by the single-sequence solver and the
    multi-sequence sweep (identical semantics by construction)."""

    __slots__ = (
        "markers", "img_mask", "frame_valid", "F", "F_real", "M_real",
        "o_trans", "o_root_orient", "o_pose_body", "o_foot_contacts", "o_betas",
        "mocap_freq",
        # camera streams for the reprojection stages (None when the ImgSmpl
        # carries no HMR camera data, e.g. synthetic priors): frame-padded
        # like the marker stream so batch lanes share one shape
        "hmr_betas", "hmr_root_orient", "camera_bbox", "cam_center",
        "cam_size", "cam_scale",
    )

    @property
    def has_camera(self) -> bool:
        return self.camera_bbox is not None


def prepare_sequence(
    img_smpl: ImgSmpl,
    mocap_markers,
    offset: Optional[int] = None,
    frame_bucket: Optional[int] = 64,
    pad_to_frames: Optional[int] = None,
    pad_to_markers: Optional[int] = None,
) -> PreparedSequence:
    """Resample the HMR prior to mocap rate, apply the temporal offset, and
    pad to shape buckets (reference ``multimodal.py:145-215`` host steps).

    ``pad_to_frames``/``pad_to_markers`` force exact padded sizes so a batch
    of sequences shares one program shape (padding frames carry zeroed
    markers + repeated prior; padding marker columns are all-zero = occluded
    under the origin-mask protocol)."""
    mocap_freq = float(mocap_markers.get_frequency())

    o_trans, o_root_orient, o_pose_body, o_foot_contacts = resample_smpl_stream(
        np.asarray(img_smpl.trans, np.float32),
        np.asarray(img_smpl.root_orient, np.float32),
        np.asarray(img_smpl.pose_body, np.float32),
        np.asarray(img_smpl.foot_contacts, np.float32),
        img_smpl.freq,
        mocap_freq,
    )
    o_betas = np.sum(np.asarray(img_smpl.betas, np.float32), axis=0, keepdims=True)
    o_betas = o_betas / max(float(np.sum(img_smpl.img_mask)), 1.0)

    markers_np = np.nan_to_num(np.asarray(mocap_markers.get_points(), np.float32), nan=0.0)

    # temporal offset (multimodal.py:209-215)
    offset = int(offset or 0)
    o_pose_body = pad_stream(o_pose_body, offset)
    o_root_orient = pad_stream(o_root_orient, offset)
    o_trans = pad_stream(o_trans, offset)
    o_foot_contacts = pad_stream(o_foot_contacts, offset)
    markers_np = pad_stream(markers_np, -offset)

    F = min(markers_np.shape[0], o_trans.shape[0])
    markers_np = markers_np[:F]
    o_trans, o_root_orient, o_pose_body, o_foot_contacts = (
        o_trans[:F], o_root_orient[:F], o_pose_body[:F], o_foot_contacts[:F],
    )
    img_mask_np = np.asarray(img_smpl.img_mask, np.float32)
    img_mask_np = pad_stream(img_mask_np, offset)[:F]

    # frame bucketing / exact-size padding: padded frames are fully masked
    F_real = F
    if pad_to_frames is not None:
        F_pad = int(pad_to_frames)
    elif frame_bucket and F % frame_bucket != 0:
        F_pad = ((F + frame_bucket - 1) // frame_bucket) * frame_bucket
    else:
        F_pad = F
    if F_pad < F:
        raise ValueError(f"pad_to_frames {F_pad} < sequence length {F}")
    if F_pad != F:
        extra = F_pad - F

        def pad_tail_repeat(a):
            return np.concatenate([a, np.repeat(a[-1:], extra, axis=0)], axis=0)

        o_trans = pad_tail_repeat(o_trans)
        o_root_orient = pad_tail_repeat(o_root_orient)
        o_pose_body = pad_tail_repeat(o_pose_body)
        o_foot_contacts = np.concatenate([o_foot_contacts, np.zeros((extra, 2), np.float32)], axis=0)
        markers_np = np.concatenate(
            [markers_np, np.zeros((extra,) + markers_np.shape[1:], np.float32)], axis=0
        )  # zeroed markers = occluded (origin-mask protocol)
        img_mask_np = np.concatenate([img_mask_np, np.zeros(extra, np.float32)], axis=0)
        F = F_pad

    M_real = markers_np.shape[1]
    if pad_to_markers is not None and pad_to_markers != M_real:
        if pad_to_markers < M_real:
            raise ValueError(f"pad_to_markers {pad_to_markers} < marker count {M_real}")
        markers_np = np.concatenate(
            [markers_np, np.zeros((F, pad_to_markers - M_real, 3), np.float32)], axis=1
        )

    prep = PreparedSequence()
    prep.markers = markers_np
    prep.img_mask = img_mask_np
    frame_valid = np.zeros(F, np.float32)
    frame_valid[:F_real] = 1.0
    prep.frame_valid = frame_valid
    prep.F = F
    prep.F_real = F_real
    prep.M_real = M_real
    prep.o_trans = o_trans
    prep.o_root_orient = o_root_orient
    prep.o_pose_body = o_pose_body
    prep.o_foot_contacts = o_foot_contacts
    prep.o_betas = o_betas
    prep.mocap_freq = mocap_freq

    # camera streams (reprojection stages read them at frame index, same as
    # the reference's direct img_smpl slices — ``multimodal.py:253-335``):
    # clamp-pad to the bucketed frame count so batch lanes share one shape
    def cam_stream(a):
        if a is None:
            return None
        a = np.asarray(a, np.float32)
        if a.shape[0] < F:
            a = np.concatenate([a, np.repeat(a[-1:], F - a.shape[0], axis=0)], axis=0)
        return a[:F]

    # ImgSmpl backfills missing camera fields with zeros (img_smpl.py:44-47);
    # an all-zero bbox stream means the HMR detector saw nothing in ANY
    # frame — i.e. there is no usable camera, and the batched reprojection
    # stages must refuse rather than optimize a degenerate criterion
    raw_bbox = getattr(img_smpl, "camera_bbox", None)
    if raw_bbox is None or not np.any(np.abs(np.asarray(raw_bbox)) > 0):
        prep.hmr_betas = prep.hmr_root_orient = prep.camera_bbox = None
        prep.cam_center = prep.cam_size = prep.cam_scale = None
        return prep
    prep.hmr_betas = cam_stream(getattr(img_smpl, "betas", None))
    prep.hmr_root_orient = cam_stream(getattr(img_smpl, "hmr_root_orient", None))
    prep.camera_bbox = cam_stream(raw_bbox)
    prep.cam_center = cam_stream(getattr(img_smpl, "center", None))
    prep.cam_size = cam_stream(getattr(img_smpl, "size", None))
    prep.cam_scale = cam_stream(getattr(img_smpl, "scale", None))
    return prep


def _chamfer_segment_convert(root0_batch_np: np.ndarray):
    """Raw chamfer-stage optimizer params -> render-ready arrays per lane
    (for the per-segment journal; reference iter_fn pkl_parameters,
    ``multimodal.py:121-133``)."""

    def conv(params, lanes):
        z = jnp.asarray(params["z"])
        pose = rot.rotation_6d_to_matrix(jnp.asarray(params["pose6d"]))
        r0 = jnp.asarray(root0_batch_np)[jnp.asarray(lanes)]
        if z.shape[-1] == 6:
            root = rot.rotation_6d_to_matrix(z)
        else:
            root = rot.rot_z(z) @ r0
        return {
            "trans": np.asarray(params["trans"]),
            "betas": np.asarray(params["betas"]),
            "pose_body": np.asarray(pose),
            "root_orient": np.asarray(root),
        }

    return conv


def _marker_segment_convert(params, lanes):
    return {
        "trans": np.asarray(params["trans"]),
        "betas": np.asarray(params["betas"]),
        "pose_body": np.asarray(rot.rotation_6d_to_matrix(jnp.asarray(params["pose6d"]))),
        "root_orient": np.asarray(rot.rotation_6d_to_matrix(jnp.asarray(params["root6d"]))),
    }


def multimodal_video_mocap(
    img_smpl: ImgSmpl,
    mocap_markers,  # Markers-like: get_points() [F, M, 3], get_frequency()
    config: Dict[str, Any],
    model: BodyModel,
    offset: Optional[int] = None,
    print_options: List[str] = [],
    save_stages: bool = False,
    iter_journal=None,
    frame_bucket: Optional[int] = 64,
) -> Dict[str, Any]:
    """Solve SMPL parameters from unlabeled markers + video prior.

    ``iter_journal``: optional ``pipeline.journal.IterationJournal`` capturing
    per-stage parameter snapshots (the reference's ``iter_fn`` protocol).

    ``frame_bucket``: pad the frame count up to a multiple of this so
    sequences of varying length share compiled programs (XLA compiles per
    shape; the canonical datasets window to fixed durations but trailing
    windows vary).  Padding frames carry zeroed markers (masked by the
    origin-mask protocol) and repeat the prior's last frame; outputs are
    sliced back to the true length.  None disables bucketing.
    """
    t_start = time.time()
    progress = "progress" in print_options

    def log(msg):
        if progress:
            print(msg)

    stages = SolveStages(model, config)
    part_fitter = PartFitter(model, config)
    stage_times: Dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                stage_times[name] = stage_times.get(name, 0.0) + time.time() - self.t0

        return _T()

    # ---- host preprocessing: resample/slerp, temporal offset, bucketing
    #      (reference multimodal.py:145-215; shared with the batch sweep)
    prep = prepare_sequence(img_smpl, mocap_markers, offset=offset, frame_bucket=frame_bucket)
    mocap_freq = prep.mocap_freq
    markers_np = prep.markers
    img_mask_np = prep.img_mask
    frame_valid = prep.frame_valid
    F, F_real = prep.F, prep.F_real
    o_trans, o_root_orient, o_pose_body = prep.o_trans, prep.o_root_orient, prep.o_pose_body
    o_foot_contacts, o_betas = prep.o_foot_contacts, prep.o_betas
    frame_valid_j = jnp.asarray(frame_valid)

    markers = jnp.asarray(markers_np)
    weights = get_marker_mask(markers)
    img_mask = jnp.asarray(img_mask_np)
    o_pose_body_j = jnp.asarray(o_pose_body)
    o_root_orient_j = jnp.asarray(o_root_orient)
    o_trans_j = jnp.asarray(o_trans)
    o_betas_j = jnp.asarray(o_betas)
    o_foot_contacts_j = jnp.asarray(o_foot_contacts)

    output: Dict[str, Any] = {"stages": {}} if save_stages else {}
    total_evals = 0  # LBFGS closure evaluations across all stages/lanes

    # ---- marker segmentation (multimodal.py:217-230): rigid clustering
    #      (cluster mode, shipped default) or the neural segmenter (network)
    log("Stage: computing marker segmentation...")
    part_mode = config["stages"]["part"].get("mode", "cluster")
    fit_marker_mask = None  # network mode restricts the fit to the chain's markers
    if part_mode == "network":
        from uuo_mocap_tpu.pipeline.segmentation import (
            chains_from_labels,
            merge_symmetric_labels,
            segment_markers_network,
        )

        # the multimodal segmenter's video branch consumes the HMR joints:
        # SMPL forward of the resampled prior stream (reference
        # ``marker_segmenter_multimodal.py:117-171`` feeds 22x3 joints)
        prior_out = _forward(
            model, SmplParams(o_pose_body_j, o_betas_j, o_root_orient_j, o_trans_j)
        )
        hmr_joints = np.asarray(prior_out["joints"][:, :22])
        marker_labels = segment_markers_network(
            markers_np, mocap_freq,
            checkpoint_root=config.get("checkpoints_dir", "./checkpoints"),
            joints=hmr_joints,
        )
        merged = merge_symmetric_labels(
            np.apply_along_axis(lambda c: np.bincount(c).argmax(), 0, marker_labels)
        )
        chains = chains_from_labels(merged, model.parents)
        largest = chains[0]
        log(f"  network chains: {[len(c) for c in chains]}; fitting chain {largest}")
        num_fit_groups = len(largest)
        fit_marker_mask = np.isin(merged, largest).astype(np.float32)  # [M]
        groups = [list(np.where(merged == j)[0]) for j in largest]
    else:
        with timed("segment_rigid"):
            # real frames only — bucket-padding zeros would distort the
            # inter-marker distance statistics
            groups = segment_rigid(markers_np[:F_real])
        marker_labels = np.zeros(markers_np.shape[:2], np.int64)
        for gi, group in enumerate(groups):
            marker_labels[:, group] = gi
        num_fit_groups = len(groups)

    # ---- AABB part-vs-full heuristic (multimodal.py:232-239)
    zero_trans = SmplParams(
        o_pose_body_j, o_betas_j * 0, o_root_orient_j, o_trans_j * 0
    )
    mean_out = _forward(model, zero_trans)
    aabb_ratio = float(
        jnp.median(
            get_aabb_volume(get_aabb(markers[:F_real]))
            / get_aabb_volume(get_aabb(mean_out["vertices"][:F_real]))
        )
    )

    chain = None
    trans = jnp.median(markers, axis=1)
    root_orient = o_root_orient_j
    betas = o_betas_j

    # ---- camera-aware rotational alignment (multimodal.py:253-335;
    #      disabled in the shipped config: reprojection_part.num_iters == 0)
    reproj_out = None
    if (config["find_best_part_fits"] and config["stages"]["reprojection_part"]["num_iters"] > 0
            and prep.has_camera):
        log("Stage [reprojection]: multi-angle camera alignment (batched)...")
        from uuo_mocap_tpu.pipeline.reprojection import ReprojectionStage

        reproj = ReprojectionStage(model, config, "reprojection_part")
        nA = int(config["stages"]["reprojection_part"]["num_angles"])
        r_angles = jnp.asarray(np.arange(nA) * 2 * np.pi / max(nA, 1), jnp.float32)
        reproj_out = reproj(
            r_angles, markers, weights, o_pose_body_j, jnp.asarray(betas),
            jnp.asarray(prep.hmr_betas),
            jnp.asarray(prep.hmr_root_orient), trans,
            jnp.asarray(prep.camera_bbox),
            jnp.asarray(prep.cam_center),
            jnp.asarray(prep.cam_size),
            jnp.asarray(prep.cam_scale),
            img_mask,
        )
        criterion = config["stages"]["reprojection_part"].get("criterion", "reprojection")
        key = "reproject" if criterion == "reprojection" else "chamfer"
        best_a = int(np.argmin(np.asarray(reproj_out["metrics"][key])))
        betas = jnp.mean(reproj_out["betas"][best_a], axis=0, keepdims=True)
        o_betas_j = betas
        root_orient = reproj_out["root_orient"][best_a]
        o_root_orient_j = root_orient
        trans = reproj_out["trans"][best_a]
        o_trans_j = trans
        if iter_journal is not None:
            iter_journal.record(
                "reprojection",
                metrics={k: np.asarray(v) for k, v in reproj_out["metrics"].items()},
                best=best_a,
            )

    # ---- part fitting (multimodal.py:341-368)
    if config["find_best_part_fits"]:
        log("Stage [part]: fitting kinematic subtrees...")
        # reference part chamfer is unweighted over real markers; padded
        # bucket frames are artificial and must not be fitted
        fit_weights = jnp.ones_like(weights) * jnp.asarray(frame_valid)[:, None]
        if fit_marker_mask is not None:  # network mode: only the chain's markers
            fit_weights = fit_weights * jnp.asarray(fit_marker_mask)[None, :]
        with timed("part_fit"):
            part_result = part_fitter(
            markers=markers,
            marker_weights=fit_weights,
            o_pose_body=o_pose_body_j,
            o_betas=o_betas_j,
            root_orient0=o_root_orient_j,
            num_rigid_groups=num_fit_groups,
            foot_contacts=o_foot_contacts_j,
            frame_valid=frame_valid_j,
        )
        marker_labels = np.asarray(part_result.marker_labels)
        total_evals += part_result.lbfgs_evals
        root_orient = part_result.params.root_orient
        trans = part_result.params.trans
        betas = part_result.params.betas
        chain = part_result.chain
        if save_stages:
            output["stages"]["part"] = _params_to_stage_dict(
                SmplParams(o_pose_body_j, betas, root_orient, trans)
            )
        if iter_journal is not None:
            iter_journal.record("part", params=SmplParams(o_pose_body_j, betas, root_orient, trans))

    # ---- full-body fallback (multimodal.py:372-375)
    if (not config["find_best_part_fits"]) or aabb_ratio > 0.4:
        trans = jnp.median(markers, axis=1)
        root_orient = o_root_orient_j
        betas = o_betas_j

    # ---- full-body reprojection alignment (multimodal.py:378-431;
    #      disabled in the shipped config: reprojection_full.num_iters == 0)
    if config["stages"]["reprojection_full"]["num_iters"] > 0 and prep.has_camera:
        log("Stage [reprojection_full]: multi-angle camera alignment (batched)...")
        from uuo_mocap_tpu.pipeline.reprojection import ReprojectionStage

        # the reference re-reads num_iters/losses from reprojection_part here
        # (multimodal.py:410); num_angles comes from reprojection_full
        reproj_f = ReprojectionStage(model, config, "reprojection_part")
        nA = int(config["stages"]["reprojection_full"]["num_angles"])
        rf_angles = jnp.asarray(np.arange(nA) * 2 * np.pi / max(nA, 1), jnp.float32)
        rf_out = reproj_f(
            rf_angles, markers, weights, o_pose_body_j, jnp.asarray(betas),
            jnp.asarray(prep.hmr_betas),
            jnp.asarray(prep.hmr_root_orient), trans,
            jnp.asarray(prep.camera_bbox),
            jnp.asarray(prep.cam_center),
            jnp.asarray(prep.cam_size),
            jnp.asarray(prep.cam_scale),
            img_mask,
        )
        best_a = int(np.argmin(np.asarray(rf_out["metrics"]["reproject"])))
        betas = jnp.mean(rf_out["betas"][best_a], axis=0, keepdims=True)
        root_orient = rf_out["root_orient"][best_a]
        trans = rf_out["trans"][best_a]

    marker_labels_mode_j = jnp.asarray(
        np.apply_along_axis(lambda c: np.bincount(c).argmax(), 0, marker_labels)
        if marker_labels.size
        else np.zeros(markers_np.shape[1], np.int64)
    )

    # ---- root stage (multimodal.py:437-454; default config: disabled)
    if config["stages"]["root"]["num_iters"] > 0:
        log("Stage [root]: optimizing root...")
        params_root, res_r = stages.root_stage(
            markers, weights, o_pose_body_j, betas, root_orient, trans,
            marker_labels_mode_j, o_betas_j, frame_valid=frame_valid_j,
        )
        total_evals += int(res_r.num_evals)
        root_orient, trans, betas = params_root.root_orient, params_root.trans, params_root.betas
        if save_stages:
            output["stages"]["root"] = _params_to_stage_dict(params_root)
        if iter_journal is not None:
            iter_journal.record("root", params=params_root)

    # ---- per-yaw-hypothesis chamfer + marker stages, batched over A
    #      (multimodal.py:462-574 -> one vmapped program)
    A = int(config["num_root_orient_angles"])
    angles = jnp.asarray(np.arange(A) * 2 * np.pi / A, jnp.float32)

    do_chamfer = config["stages"]["chamfer"]["num_iters"] > 0
    do_marker = config["stages"]["marker"]["num_iters"] > 0

    # Every stage advances all A hypotheses together through the segmented
    # batched L-BFGS driver — bounded device executions, no host sync of
    # parameters between iterations.
    log(f"Stages [chamfer+marker]: solving {A} yaw hypotheses (batched)...")

    seed_roots = jax.jit(jax.vmap(
        lambda angle: rot.normalize_rotation(
            rot.rot_z(jnp.broadcast_to(angle[None, None], (F, 1, 1))) @ root_orient
        )
    ))
    root0_batch = seed_roots(angles)  # [A, F, 1, 3, 3]

    if do_chamfer:
        if iter_journal is not None:
            stages._chamfer_solver.snapshot = iter_journal.segment_hook(
                "chamfer", _chamfer_segment_convert(np.asarray(root0_batch))
            )
        with timed("chamfer"):
            chamfer_all, res_c = stages.chamfer_stage_batched(
            markers, weights, o_pose_body_j, o_betas_j,
            o_pose_body_j, betas, root0_batch, trans, marker_labels_mode_j,
            frame_valid=frame_valid_j,
        )
        stages._chamfer_solver.snapshot = None
        total_evals += int(np.sum(np.asarray(res_c.num_evals)))
    else:
        tile = lambda x: jnp.broadcast_to(x[None], (A,) + x.shape)
        chamfer_all = SmplParams(tile(o_pose_body_j), tile(betas), root0_batch, tile(trans))

    if do_marker:
        nearest_labels = (
            marker_labels_mode_j if config["stages"]["segment"]["granularity"] == "part" else None
        )
        with timed("nearest"):
            attach_all = stages.nearest_points_batched(markers, chamfer_all, img_mask, nearest_labels)
            jax.block_until_ready(attach_all.vertex_ids)
        if iter_journal is not None:
            stages._marker_solver.snapshot = iter_journal.segment_hook(
                "marker", _marker_segment_convert
            )
        with timed("marker"):
            marker_all, res_m = stages.marker_stage_batched(
            markers, weights, o_pose_body_j, o_betas_j, chamfer_all, attach_all,
            frame_valid=frame_valid_j,
        )
        stages._marker_solver.snapshot = None
        total_evals += int(np.sum(np.asarray(res_m.num_evals)))
    else:
        marker_all = chamfer_all

    scores = stages.score_chamfer_batched(markers, weights, marker_all)
    best = int(np.argmin(np.asarray(scores)))
    log(f"  hypothesis scores: {np.asarray(scores)} -> best angle index {best}")

    smpl_chamfer = jax.tree_util.tree_map(lambda x: x[best], chamfer_all)
    params = jax.tree_util.tree_map(lambda x: x[best], marker_all)
    if save_stages and do_chamfer:
        output["stages"]["chamfer"] = _params_to_stage_dict(smpl_chamfer)
    if save_stages and do_marker:
        output["stages"]["marker"] = _params_to_stage_dict(params)
    if iter_journal is not None:
        iter_journal.record("chamfer", params=smpl_chamfer, scores=np.asarray(scores))
        iter_journal.record("marker", params=params)

    # ---- final refinement repeats (multimodal.py:609-677)
    if do_marker:
        for rep in range(int(config["stage_repeats"])):
            log(f"Stage [marker_final]: refinement {rep + 1}/{config['stage_repeats']}...")
            with timed("nearest_final"):
                attachment = stages.nearest_points(markers, params, img_mask, nearest_labels)
                jax.block_until_ready(attachment.vertex_ids)
            if config.get("recompute_marker_labels"):
                labels = stages.marker_labels_from_attachment(attachment, F)
                marker_labels = np.asarray(labels)
                if config["stages"]["segment"]["rigid_filter"]:
                    from uuo_mocap_tpu.pipeline.segmentation import filter_rigid

                    marker_labels = filter_rigid(markers_np, marker_labels)
            if iter_journal is not None:
                stages._marker_solver.snapshot = iter_journal.segment_hook(
                    f"marker_final_{rep}", _marker_segment_convert
                )
            with timed("marker_final"):
                params_b, res_f = stages.marker_stage_batched(
                markers, weights, params.pose_body, o_betas_j,
                jax.tree_util.tree_map(lambda x: x[None], params),
                jax.tree_util.tree_map(lambda x: x[None], attachment),
                frame_valid=frame_valid_j,
            )
            stages._marker_solver.snapshot = None
            params = jax.tree_util.tree_map(lambda x: x[0], params_b)
            total_evals += int(np.sum(np.asarray(res_f.num_evals)))
            if iter_journal is not None:
                iter_journal.record(f"marker_final_{rep}", params=params)
        if save_stages:
            output["stages"]["marker_final"] = _params_to_stage_dict(params)

    # ---- output assembly (multimodal.py:679-710)
    # slice padded frames back off every per-frame output
    def unpad(a):
        return a[:F_real] if frame_bucket else a

    if save_stages:
        for stage_dict in output["stages"].values():
            for key in ("trans", "root_orient", "pose_body"):
                stage_dict[key] = unpad(stage_dict[key])

    output["trans"] = unpad(np.asarray(params.trans))
    output["root_orient"] = unpad(np.asarray(rot.normalize_rotation(params.root_orient)))
    output["pose_body"] = unpad(np.asarray(rot.normalize_rotation(params.pose_body)))
    output["betas"] = np.broadcast_to(np.asarray(params.betas), (F_real, 10)).copy()
    output["mocap_frame_rate"] = mocap_freq
    mocap_markers.set_points(markers_np[:F_real])
    output["mocap_markers"] = mocap_markers
    output["markers_labels"] = np.asarray(marker_labels)[:F_real]
    if chain is not None:
        output["chain"] = chain
    output["solve_time_s"] = time.time() - t_start
    output["lbfgs_evals"] = total_evals
    output["stage_times_s"] = {k: round(v, 2) for k, v in stage_times.items()}
    if progress:
        log(f"  stage times: {output['stage_times_s']}")
    return output
