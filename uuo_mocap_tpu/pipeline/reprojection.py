"""Camera-aware rotational alignment (reprojection stage).

TPU-native re-design of the reference's ``optim_reprojection``
(``hmr_utils.py:170-425``): jointly optimize a global yaw about the camera's
y-axis, per-frame body translations, a single camera translation, and betas,
minimizing (a) 2D reprojection error against HMR's own projected joints and
(b) single-directional chamfer against the markers in world space.  The
multi-angle search (``multimodal.py:253-335``) becomes one vmapped program
over the angle axis.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.camera.hmr import (
    convert_hmr_pos_to_mocap_pos,
    convert_mocap_pos_to_hmr_pos,
    get_3d_parameters,
    perspective_projection,
)
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import masked_chamfer
from uuo_mocap_tpu.solver import LbfgsOptions, lbfgs_minimize

# camera frame (y-up) -> mocap frame (z-up); reference ``hmr_utils.py:224-229``
CORRECTION = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)


class ReprojectionStage:
    def __init__(self, model: BodyModel, config: Dict[str, Any], stage_key: str = "reprojection_part"):
        self.model = model
        self.config = config
        self.stage_key = stage_key

    @functools.cached_property
    def _run(self):
        cfg = self.config
        scfg = cfg["stages"][self.stage_key]
        w_reproj = float(scfg["losses"]["reprojection"])
        w_chamfer = float(scfg["losses"]["chamfer"])
        opts = LbfgsOptions(
            max_iter=int(scfg["num_iters"]),
            tolerance_grad=float(cfg["optimizer"]["tolerance_grad"]),
            tolerance_change=float(cfg["optimizer"]["tolerance_change"]),
            history_size=int(cfg["optimizer"].get("history_size", 10)),
        )
        model = self.model
        correction = jnp.asarray(CORRECTION)

        def smpl_fwd(pose, betas, root, trans):
            return lbs_forward(model, pose, betas, root, trans)

        def run_single(
            angle,  # scalar yaw seed
            markers,  # [F, M, 3]
            marker_weights,  # [F, M]
            o_pose_body,  # [F, 23, 3, 3]
            betas0,  # [1, 10]
            hmr_betas,  # [F, 10]
            hmr_root_orient,  # [F, 1, 3, 3] camera frame
            trans0,  # [F, 3] mocap frame
            pred_cam, cam_center, cam_size, cam_scale,  # camera params
            img_mask,  # [F]
        ):
            F = o_pose_body.shape[0]
            dtype = markers.dtype

            joints_out = get_3d_parameters(
                smpl_fwd, hmr_betas, o_pose_body, hmr_root_orient,
                pred_cam, cam_center, cam_size, cam_scale,
            )
            gt_2d = jnp.nan_to_num(joints_out["pred_keypoints_2d_smpl"], nan=0.0)  # [F, 45, 2]
            cam_t = joints_out["pred_cam_t"]  # [F, 3]
            reproject_mask = jnp.mean(jnp.isfinite(cam_t).astype(dtype), axis=-1) * img_mask  # [F]
            cam_t = jnp.nan_to_num(cam_t, nan=0.0)
            focal = jnp.mean(joints_out["focal_length"], axis=0, keepdims=True)  # [1, 2]
            camera_center = joints_out["camera_center"]  # [F, 2]

            # swap body and camera positions (reference :254-268)
            body_trans_hmr = cam_t  # body placed at per-frame crop-camera offsets
            cam_trans_world = trans0  # camera takes the body's old (marker-space) position

            markers_med = jnp.median(markers.reshape(-1, 3), axis=0, keepdims=True)
            offset = convert_mocap_pos_to_hmr_pos(markers_med) - jnp.median(body_trans_hmr, axis=0, keepdims=True)
            body_trans_hmr = body_trans_hmr + offset
            cam_single0 = jnp.mean(cam_trans_world - offset, axis=0, keepdims=True)  # [1, 3]

            params0 = {
                "y_angle": jnp.asarray(angle, dtype).reshape(1),
                "body_trans": body_trans_hmr,
                "cam_trans": cam_single0,
                "betas": betas0,
            }

            def world_state(p):
                y = p["y_angle"].reshape(1, 1, 1)
                y_root = rot.rot_y(jnp.broadcast_to(y, (F, 1, 1))) @ hmr_root_orient
                world_root = correction @ y_root
                world_trans = convert_hmr_pos_to_mocap_pos(p["body_trans"])
                return world_root, world_trans, y

            def loss_fn(p):
                betas_f = jnp.broadcast_to(p["betas"], (F, 10))
                world_root, world_trans, y = world_state(p)

                # camera-frame body for projection: rotate body about camera
                cam_trans_f = jnp.broadcast_to(p["cam_trans"], (F, 3))
                offset_c = p["body_trans"] - cam_trans_f
                inv_trans = rot.apply_rotation(rot.rot_y(-y)[0], offset_c) + cam_trans_f

                out_cam = smpl_fwd(o_pose_body, betas_f, hmr_root_orient, inv_trans)
                kp2d = perspective_projection(
                    out_cam["joints"],
                    translation=cam_trans_f,
                    focal_length=jnp.broadcast_to(focal, (F, 2)),
                    camera_center=camera_center,
                ) + 0.5
                reproj = jnp.mean(((kp2d - gt_2d) ** 2) * reproject_mask[:, None, None])

                out_world = smpl_fwd(o_pose_body, betas_f, world_root, world_trans)
                cham = masked_chamfer(markers, out_world["vertices"], marker_weights, single_directional=True)
                return reproj * w_reproj + cham * w_chamfer

            p_opt, res = lbfgs_minimize(loss_fn, params0, opts)

            world_root, world_trans, y = world_state(p_opt)
            betas_f = jnp.broadcast_to(p_opt["betas"], (F, 10))
            out_world = smpl_fwd(o_pose_body, betas_f, world_root, world_trans)
            cham_err = masked_chamfer(markers, out_world["vertices"], marker_weights, single_directional=True)

            cam_trans_f = jnp.broadcast_to(p_opt["cam_trans"], (F, 3))
            offset_c = p_opt["body_trans"] - cam_trans_f
            inv_trans = rot.apply_rotation(rot.rot_y(-y)[0], offset_c) + cam_trans_f
            out_cam = smpl_fwd(o_pose_body, betas_f, hmr_root_orient, inv_trans)
            kp2d = perspective_projection(
                out_cam["joints"], cam_trans_f, jnp.broadcast_to(focal, (F, 2)), camera_center
            ) + 0.5
            reproj_err = jnp.mean(((kp2d - gt_2d) ** 2) * reproject_mask[:, None, None])

            return {
                "betas": betas_f,
                "root_orient": world_root,
                "trans": world_trans,
                "cam_trans": convert_hmr_pos_to_mocap_pos(cam_trans_f),
                "joints_2d": kp2d,
                "joints_2d_gt": gt_2d,
                "focal_length": focal,
                "camera_center": camera_center,
                "reproject_mask": reproject_mask,
                "output_angle": p_opt["y_angle"],
                "metrics": {"chamfer": cham_err, "reproject": reproj_err},
            }

        self._run_single = run_single
        return jax.jit(jax.vmap(run_single, in_axes=(0,) + (None,) * 12))

    @functools.cached_property
    def _run_lanes(self):
        """Every argument lane-batched (lane = sequence x angle) — the
        multi-sequence sweep's form of the multi-angle search
        (``multimodal.py:253-335`` over ``test/test.py:50-147``)."""
        _ = self._run  # bind self._run_single
        return jax.jit(jax.vmap(self._run_single, in_axes=(0,) * 13))

    def lanes(self, angles_l, markers_l, weights_l, o_pose_l, betas0_l, hmr_betas_l,
              hmr_root_l, trans0_l, pred_cam_l, cam_center_l, cam_size_l, cam_scale_l,
              img_mask_l):
        """Per-lane solve; callers slice the lane axis to a stable program
        width (``parallel.batch_solver.chunked_lanes``)."""
        return self._run_lanes(
            angles_l, markers_l, weights_l, o_pose_l, betas0_l, hmr_betas_l,
            hmr_root_l, trans0_l, pred_cam_l, cam_center_l, cam_size_l, cam_scale_l,
            img_mask_l,
        )

    def __call__(self, angles, markers, marker_weights, o_pose_body, betas0, hmr_betas,
                 hmr_root_orient, trans0, pred_cam, cam_center, cam_size, cam_scale, img_mask):
        """Solve all yaw seeds at once: ``angles`` [A] -> per-angle outputs
        stacked on a leading axis (replaces ``multimodal.py:272-305``)."""
        return self._run(
            angles, markers, marker_weights, o_pose_body, betas0, hmr_betas,
            hmr_root_orient, trans0, pred_cam, cam_center, cam_size, cam_scale, img_mask,
        )
