"""Multi-sequence batched solve — the sharded benchmark sweep.

The reference's batch driver solves sequences one-by-one in a Python loop
(``test/test.py:50-147``); BASELINE.json's config 5 asks for the sweep to be
a sharded program.  Here S sequences x A yaw hypotheses become S*A lanes of
the segmented batched L-BFGS drivers (chamfer -> correspondence -> marker
IK), sharded over the mesh's ``data`` axis; the only cross-device traffic is
the final per-sequence argmin over hypothesis scores.

Sequences must share shapes [F, M] (the reference's preprocessing windows
clips to a fixed duration, so real batches do).  Part fitting seeds each
sequence independently beforehand when enabled; the sweep parallelizes the
per-hypothesis stages, which dominate the solve (see Benchmarks.md).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import masked_chamfer
from uuo_mocap_tpu.pipeline.stages import (
    SEGMENT_SIZE,
    MarkerAttachment,
    SmplParams,
    SolveStages,
    _forward,
    _stage_opts,
)
from uuo_mocap_tpu.solver import losses as L
from uuo_mocap_tpu.solver.lbfgs import BatchedLbfgs


class MultiSequenceSolver:
    """Solve a batch of same-shape sequences, hypotheses and sequences as
    lanes of single device programs, optionally sharded over a mesh."""

    def __init__(self, model: BodyModel, config: Dict[str, Any], mesh: Optional[Mesh] = None):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.stages = SolveStages(model, config)

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P("data"))
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)

    @functools.cached_property
    def _chamfer_solver(self) -> BatchedLbfgs:
        cfg = self.config
        scfg = cfg["stages"]["chamfer"]
        losses = scfg["losses"]
        model = self.model
        single_dir = bool(scfg["single_directional"])

        def fun(p, lane, shared):
            z_root = rot.rot_z(p["z"]) @ lane["root0"]
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            F = lane["markers"].shape[0]
            sp = SmplParams(pose, p["betas"], z_root, p["trans"])
            out = _forward(model, sp)
            total = 0.0
            if "full_chamfer" in losses:
                total += losses["full_chamfer"] * L.full_chamfer_loss(
                    lane["markers"], out["vertices"], lane["weights"], single_dir
                )
            if "reg_pose_body" in losses:
                total += losses["reg_pose_body"] * L.mse(pose, lane["o_pose"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], lane["o_betas"])
            return total

        import dataclasses

        opts = dataclasses.replace(_stage_opts(cfg, "chamfer"), lr=0.1)
        return BatchedLbfgs(fun, opts, segment_size=SEGMENT_SIZE)

    @functools.cached_property
    def _marker_solver(self) -> BatchedLbfgs:
        cfg = self.config
        losses = cfg["stages"]["marker"]["losses"]
        model = self.model

        def fun(p, lane, shared):
            pose = rot.rotation_6d_to_matrix(p["pose6d"])
            root = rot.rotation_6d_to_matrix(p["root6d"])
            sp = SmplParams(pose, p["betas"], root, p["trans"])
            out = _forward(model, sp)
            verts = out["vertices"]
            att_ids, att_w = lane["att_ids"], lane["att_w"]
            virtual = (
                att_w[None, :, 0:1] * jnp.take_along_axis(verts, att_ids[None, :, 0:1].repeat(3, -1), axis=-2)
            )
            for k in (1, 2):
                virtual = virtual + att_w[None, :, k:k + 1] * jnp.take_along_axis(
                    verts, att_ids[None, :, k:k + 1].repeat(3, -1), axis=-2
                )
            total = 0.0
            if "marker" in losses:
                total += losses["marker"] * L.marker_loss(lane["markers"], virtual, lane["weights"])
            if "reg_pose_body" in losses:
                total += losses["reg_pose_body"] * L.mse(pose, lane["o_pose"])
            if "reg_betas" in losses:
                total += losses["reg_betas"] * L.mse(p["betas"], lane["o_betas"])
            return total

        return BatchedLbfgs(fun, _stage_opts(cfg, "marker"), segment_size=SEGMENT_SIZE)

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
        S, F = markers.shape[:2]
        A = int(self.config["num_root_orient_angles"])
        Lanes = S * A
        angles = jnp.asarray(np.arange(A) * 2 * np.pi / A, jnp.float32)
        if img_mask is None:
            img_mask = jnp.ones((S, F))

        # ---- expand to S*A lanes (hypothesis-major within each sequence)
        def expand(x):  # [S, ...] -> [S*A, ...]
            return jnp.repeat(x, A, axis=0)

        z_rots = rot.rot_z(jnp.broadcast_to(angles[:, None, None, None], (A, F, 1, 1)))  # [A,F,1,3,3]
        root0_lanes = jax.vmap(
            lambda r0: jax.vmap(lambda z: rot.normalize_rotation(z @ r0))(z_rots)
        )(root_orient0).reshape(Lanes, F, 1, 3, 3)

        lane = self._shard({
            "markers": expand(markers),
            "weights": expand(weights),
            "o_pose": expand(o_pose_body),
            "o_betas": expand(o_betas),
            "root0": root0_lanes,
        })

        pose6d0 = rot.matrix_to_rotation_6d(lane["o_pose"])
        params0 = self._shard({
            "trans": expand(trans0),
            "z": jnp.zeros((Lanes, F, 1, 1)),
            "betas": lane["o_betas"],
            "pose6d": pose6d0,
        })

        p_c, res_c = self._chamfer_solver.run(params0, lane, {})

        # ---- correspondence per lane (jitted vmap)
        def to_params(p, r0):
            return SmplParams(
                rot.rotation_6d_to_matrix(p["pose6d"]), p["betas"],
                rot.rot_z(p["z"]) @ r0, p["trans"],
            )

        params_c = jax.jit(jax.vmap(to_params))(p_c, lane["root0"])
        attach = jax.jit(jax.vmap(self.stages.nearest_points, in_axes=(0, 0, 0)))(
            lane["markers"], params_c, expand(img_mask)
        )

        marker_params0 = jax.jit(jax.vmap(lambda sp: {
            "pose6d": rot.matrix_to_rotation_6d(sp.pose_body),
            "betas": sp.betas,
            "root6d": rot.matrix_to_rotation_6d(sp.root_orient),
            "trans": sp.trans,
        }))(params_c)
        lane_m = dict(lane)
        lane_m["att_ids"] = attach.vertex_ids
        lane_m["att_w"] = attach.weights
        p_m, res_m = self._marker_solver.run(marker_params0, lane_m, {})

        params_m = jax.jit(jax.vmap(lambda p: SmplParams(
            rot.rotation_6d_to_matrix(p["pose6d"]), p["betas"],
            rot.rotation_6d_to_matrix(p["root6d"]), p["trans"],
        )))(p_m)

        # ---- best hypothesis per sequence by weighted chamfer
        scores = jax.jit(jax.vmap(
            lambda m, w, sp: masked_chamfer(m, _forward(self.model, sp)["vertices"], w)
        ))(lane["markers"], lane["weights"], params_m)
        scores = scores.reshape(S, A)
        best = jnp.argmin(scores, axis=1)  # [S]

        def select(tree):
            return jax.tree_util.tree_map(
                lambda x: x.reshape((S, A) + x.shape[1:])[jnp.arange(S), best], tree
            )

        result = select(params_m)
        return {
            "params": result,
            "scores": np.asarray(scores),
            "best_hypothesis": np.asarray(best),
            "lbfgs_evals": int(np.sum(np.asarray(res_c.num_evals)) + np.sum(np.asarray(res_m.num_evals))),
        }
