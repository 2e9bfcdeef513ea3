"""High-level SMPL inference wrappers mirroring the reference API surface.

Reference contracts: ``SmplInference.__call__(poses, betas, root_orient,
trans) -> {joints, vertices}`` (``src/video_mocap/utils/smpl.py:29-50``) and
the gender-blended batched variant ``SmplInferenceGender``
(``utils/smpl.py:56-131``).  Unlike the reference (eager torch), the forward
here is a single jitted XLA program; repeated calls with the same shapes hit
the compile cache.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward, load_body_model
from uuo_mocap_tpu.ops import rotations as rot


@functools.partial(jax.jit, static_argnames=("with_pose_blendshapes",))
def _forward(model, pose_body, betas, root_orient, trans, with_pose_blendshapes=True):
    return lbs_forward(model, pose_body, betas, root_orient, trans, with_pose_blendshapes)


class SmplInference:
    """Single-gender SMPL forward (rot-matrix pose input, pose2rot=False).

    ``model`` may be a :class:`BodyModel`, a path to SMPL assets, or ``None``
    for the synthetic test model.
    """

    def __init__(self, model: Optional[BodyModel | str] = None, gender: str = "neutral"):
        if model is None:
            from uuo_mocap_tpu.body.synthetic import synthetic_body_model

            model = synthetic_body_model(gender)
        elif isinstance(model, str):
            model = load_body_model(model, gender)
        self.model: BodyModel = model
        self.gender = gender

    def __call__(
        self,
        poses: jnp.ndarray,  # [..., 23, 3, 3]
        betas: jnp.ndarray,  # [..., 10]
        root_orient: jnp.ndarray,  # [..., 1, 3, 3]
        trans: jnp.ndarray,  # [..., 3]
    ) -> Dict[str, jnp.ndarray]:
        if betas.shape[-1] != 10:
            raise ValueError("Betas array must have 10 beta values")
        return _forward(self.model, poses, betas, root_orient, trans)

    @property
    def faces(self) -> np.ndarray:
        return self.model.faces

    @property
    def parents(self) -> np.ndarray:
        return self.model.parents

    def get_lbs_weights(self) -> jnp.ndarray:
        return self.model.lbs_weights


class SmplInferenceGender:
    """Male+female models blended by a per-sample gender one-hot, batched
    [N, F, ...] (reference ``utils/smpl.py:77-131``).

    The reference runs *both* gender models on every sample and lerps the
    outputs; we do the same (it is differentiable in the one-hot), but as one
    jitted program.
    """

    def __init__(self, male: Optional[BodyModel | str] = None, female: Optional[BodyModel | str] = None):
        if male is None or female is None:
            from uuo_mocap_tpu.body.synthetic import synthetic_body_model

            male = male or synthetic_body_model("male")
            female = female or synthetic_body_model("female")
        if isinstance(male, str):
            male = load_body_model(male, "male")
        if isinstance(female, str):
            female = load_body_model(female, "female")
        self.models = {"male": male, "female": female}

    def __call__(
        self,
        poses: jnp.ndarray,  # [N, F, 69] axis-angle or [N, F, 23, 3, 3]
        betas: jnp.ndarray,  # [N, 10]
        root_orient: jnp.ndarray,  # [N, F, 3] or [N, F, 3, 3]
        trans: jnp.ndarray,  # [N, F, 3]
        gender_one_hot: jnp.ndarray,  # [N, 2] (male, female)
        pose2rot: bool = True,
        compute_part_labels: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        if betas.shape[-1] != 10:
            raise ValueError("Betas array must have 10 beta values")
        if gender_one_hot.ndim != 2:
            raise ValueError("Gender one-hot vector must have 2 dimensions")

        N, F = trans.shape[:2]
        if pose2rot:
            pose_body = rot.axis_angle_to_matrix(poses.reshape(N, F, 23, 3))
            root_mat = rot.axis_angle_to_matrix(root_orient.reshape(N, F, 1, 3))
        else:
            pose_body = poses.reshape(N, F, 23, 3, 3)
            root_mat = root_orient.reshape(N, F, 1, 3, 3)

        betas_bf = jnp.broadcast_to(betas[:, None, :], (N, F, 10))

        out_m = _forward(self.models["male"], pose_body, betas_bf, root_mat, trans)
        out_f = _forward(self.models["female"], pose_body, betas_bf, root_mat, trans)

        wm = gender_one_hot[:, None, None, None, 0]
        wf = gender_one_hot[:, None, None, None, 1]
        output = {
            "joints": out_m["joints"][..., :24, :] * wm + out_f["joints"][..., :24, :] * wf,
            "vertices": out_m["vertices"] * wm + out_f["vertices"] * wf,
        }
        if compute_part_labels:
            lbs = (
                self.models["male"].lbs_weights * gender_one_hot[0, 0]
                + self.models["female"].lbs_weights * gender_one_hot[0, 1]
            )
            output["vertex_part_labels"] = jnp.broadcast_to(lbs[None], (N,) + lbs.shape)
        return output
