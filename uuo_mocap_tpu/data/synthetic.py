"""Synthetic sequence + marker generation — the closed-loop test harness.

Mirrors the reference's synthetic tooling (``markers/markers_synthetic.py``,
``datasets/dataset_mocap.py:109-151`` ``compute_markers``,
``tools/export_synthetic_c3d.py``): generate markers from known SMPL
parameters, solve, and score against the generating ground truth — the
de-facto integration test of the original (SURVEY.md §4.3).

Since AMASS data isn't vendorable, poses come from a smooth procedural
motion model (band-limited joint-angle trajectories) — every consumer only
needs *plausible* body motion with known ground truth.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline.stages import SmplParams
from uuo_mocap_tpu.settings import MARKER_DISTANCE

# per-joint motion amplitude (radians) — limbs move, spine is stiffer
_JOINT_AMP = np.array(
    [0.4, 0.4, 0.15, 0.5, 0.5, 0.12, 0.35, 0.35, 0.1, 0.15, 0.15, 0.2,
     0.1, 0.1, 0.25, 0.45, 0.45, 0.5, 0.5, 0.3, 0.3, 0.15, 0.15],
    dtype=np.float32,
)


def random_pose_sequence(
    num_frames: int,
    seed: int = 0,
    freq: float = 30.0,
    yaw: float = 0.0,
    travel: float = 0.5,
) -> SmplParams:
    """Smooth random body motion with known ground truth.

    Band-limited noise per joint axis: sum of a few sinusoids with random
    phases, scaled per joint.  Root yaws by ``yaw`` and translates along a
    smooth path of total length ~``travel`` meters.
    """
    rng = np.random.RandomState(seed)
    t = np.arange(num_frames, dtype=np.float32) / freq

    def band_limited(shape, fmax=1.5, n_comp=4, amp=1.0):
        out = np.zeros((num_frames,) + shape, np.float32)
        for _ in range(n_comp):
            f = rng.uniform(0.1, fmax, shape).astype(np.float32)
            phase = rng.uniform(0, 2 * np.pi, shape).astype(np.float32)
            a = rng.uniform(0.2, 1.0, shape).astype(np.float32) * amp / n_comp
            out += a * np.sin(2 * np.pi * f * t.reshape(-1, *([1] * len(shape))) + phase)
        return out

    aa = band_limited((23, 3)) * _JOINT_AMP[None, :, None]  # [F, 23, 3]
    pose_body = rot.axis_angle_to_matrix(jnp.asarray(aa))

    root_aa = np.zeros((num_frames, 1, 3), np.float32)
    root_aa[:, 0, 2] = yaw + band_limited((), fmax=0.3, amp=0.2)
    root_orient = rot.axis_angle_to_matrix(jnp.asarray(root_aa))

    path = band_limited((3,), fmax=0.4, amp=travel)
    path[:, 1] *= 0.1  # mostly planar travel (y is up in the body model)
    trans = jnp.asarray(path)

    betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.5)
    return SmplParams(pose_body, betas, root_orient, trans)


class SyntheticMarkers(NamedTuple):
    points: jnp.ndarray  # [F, M, 3]
    vertex_ids: np.ndarray  # [M] generating vertex (or face anchor)
    freq: float
    gt: SmplParams


_SURFACE_JIT: dict = {}


def _surface_points_fn(model: BodyModel):
    """Per-model jitted (pose, betas, root, trans, vid, offset) -> marker
    points: LBS forward + vertex normals + normal offset at the sampled
    vertex ids.  One compile per (model, F, M) shape, cached."""
    import jax

    # keyed by id + identity-checked: a bare id key could serve a stale
    # closure if the model were GC'd and its address reused; the stored
    # strong reference both pins the id and enables the `is` check
    key = id(model)
    hit = _SURFACE_JIT.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]

    # pin the closed-over model tensors to the CPU backend: jit resolves
    # the compile target from committed constants, and a TPU-committed
    # model would drag this scatter-heavy program onto the accelerator
    # where it compiles pathologically (minutes on the axon tunnel) —
    # generation is host-side data tooling, not solve path
    import dataclasses as _dc

    from uuo_mocap_tpu.body.model import host_consts

    cpu = jax.local_devices(backend="cpu")[0]
    # build the CPU copy from the registered host-side numpy tensors when
    # the model has them: reading the committed device tensors back is a
    # ~19 MB TPU->host transfer over the axon tunnel — seconds at best,
    # and observed to wedge the client entirely (2026-08-20 bench hang)
    hc = host_consts(model)
    if hc is not None:
        model_cpu = _dc.replace(model, **{
            name: jax.device_put(arr, cpu) for name, arr in hc.items()})
    else:
        model_cpu = _dc.replace(model, **{
            name: jax.device_put(jnp.asarray(getattr(model, name)), cpu)
            for name in ("v_template", "shapedirs", "posedirs", "j_regressor", "lbs_weights")
        })
    faces = jax.device_put(jnp.asarray(np.asarray(model.faces)), cpu)

    def impl(pose, betas, root, trans, vid, offset):
        out = lbs_forward(model_cpu, pose, betas, root, trans)
        verts = out["vertices"]  # [F, V, 3]
        # area-weighted vertex normals, scatter-add form (the host-numpy
        # ops.geometry.vertex_normals is unjittable; generation runs on
        # the CPU backend where XLA scatters are cheap)
        t0, t1, t2 = (verts[:, faces[:, k]] for k in range(3))
        face_n = jnp.cross(t1 - t0, t2 - t0)  # [F, T, 3]
        vn = jnp.zeros_like(verts)
        for k in range(3):
            vn = vn.at[:, faces[:, k]].add(face_n)
        vn = vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        return verts[:, vid] + vn[:, vid] * offset

    fn = jax.jit(impl)
    # the stored strong reference to the ORIGINAL model pins its id (no
    # reuse-after-GC) and backs the `is` check above
    _SURFACE_JIT[key] = (model, fn)
    return fn


def generate_markers(
    model: BodyModel,
    params: SmplParams,
    num_markers: int = 41,
    seed: int = 0,
    freq: float = 30.0,
    surface_offset: float = MARKER_DISTANCE,
    occlusion_rate: float = 0.0,
    position_noise: float = 0.0,
    shuffle: bool = False,
    vertex_ids=None,
) -> SyntheticMarkers:
    """Virtual markers at random surface vertices + normal offset
    (the reference's barycentric surface sampling, ``dataset_mocap.py:109-151``,
    with vertices as anchors; layout-based variant in
    ``data/marker_layout.py``).  Occluded markers are zeroed, matching the
    origin-mask protocol (``optimization.py:703-715``).

    ``vertex_ids`` overrides the random anchor draw (e.g. a named layout's
    ids from ``marker_layout.resolve_layout_vertex_ids`` — random vertex
    draws follow the mesh's torso-heavy density and leave ankles/feet/
    wrists uninstrumented, unlike any real capture layout)."""
    rng = np.random.RandomState(seed)
    F = params.trans.shape[0]
    betas = jnp.broadcast_to(params.betas, (F, 10))

    if vertex_ids is not None:
        vid = np.asarray(vertex_ids, np.int64)
        num_markers = int(vid.shape[0])
    else:
        vid = rng.choice(model.num_vertices, num_markers, replace=False)
    # jitted surface sampling: the eager op-by-op LBS + normals at [F, V]
    # costs minutes per 450-frame sequence on a 1-vCPU host (and ~0.4 s/op
    # in XLA compiles on the tunneled TPU backend)
    points = _surface_points_fn(model)(
        params.pose_body, betas, params.root_orient, params.trans,
        jnp.asarray(vid), surface_offset,
    )  # [F, M, 3]

    if position_noise > 0:
        points = points + jnp.asarray(rng.randn(F, num_markers, 3).astype(np.float32) * position_noise)
    if occlusion_rate > 0:
        occl = rng.rand(F, num_markers) < occlusion_rate
        points = jnp.where(jnp.asarray(occl)[..., None], 0.0, points)
    if shuffle:
        pts = np.asarray(points)
        for f in range(F):
            pts[f] = pts[f, rng.permutation(num_markers)]
        points = jnp.asarray(pts)

    return SyntheticMarkers(points=points, vertex_ids=vid, freq=freq, gt=params)


def perturb_params(params: SmplParams, seed: int = 0, pose_noise: float = 0.05,
                   trans_noise: float = 0.1, betas_noise: float = 0.3) -> SmplParams:
    """An "HMR-like" degraded prior from ground truth: noisy pose/trans/betas
    (stands in for 4D-Humans output when building synthetic pipelines)."""
    rng = np.random.RandomState(seed + 1)
    F = params.trans.shape[0]
    d_aa = jnp.asarray(rng.randn(F, 23, 3).astype(np.float32) * pose_noise)
    pose = rot.axis_angle_to_matrix(d_aa) @ params.pose_body
    d_root = jnp.asarray(rng.randn(F, 1, 3).astype(np.float32) * pose_noise)
    root = rot.axis_angle_to_matrix(d_root) @ params.root_orient
    trans = params.trans + jnp.asarray(rng.randn(F, 3).astype(np.float32) * trans_noise)
    betas = params.betas + jnp.asarray(rng.randn(1, 10).astype(np.float32) * betas_noise)
    return SmplParams(pose, betas, root, trans)
