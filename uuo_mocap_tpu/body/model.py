"""SMPL body model: asset container + jitted LBS forward pass.

TPU-native replacement for the reference's ``smplx.create`` dependency
(reference ``src/video_mocap/utils/smpl.py:22-27``).  The forward pass —
shape blendshapes, pose blendshapes, joint regression, linear blend
skinning — is pure JAX, expressed as a handful of large matmuls so XLA
tiles them onto the MXU, batched over arbitrary leading dims
(hypotheses x frames) per the build plan (SURVEY.md §7.1).

Assets are loaded from user-supplied SMPL pickles (chumpy-encoded, decoded
here without a chumpy/torch dependency) or from npz; a deterministic
synthetic model with identical shapes ships for tests and benchmarks
(``uuo_mocap_tpu.body.synthetic``).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import hashlib
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_VERTICES = 6890
NUM_JOINTS = 24  # LBS joints
NUM_BETAS = 10
NUM_POSE_JOINTS = NUM_JOINTS - 1  # body pose, excl. root

# SMPL kinematic tree (standard; reference gets it from smplx.parents).
PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# Extra surface joints appended by smplx's VertexJointSelector for SMPL
# (total output joints 24 + 21 = 45, consumed as [F, 45, ...] by the
# reference's reprojection stage, ``hmr_utils.py:319-326``).
# Order: face (nose, reye, leye, rear, lear), feet (LBigToe, LSmallToe,
# LHeel, RBigToe, RSmallToe, RHeel), hand tips (l/r thumb..pinky).
EXTRA_JOINT_VERTEX_IDS = np.array(
    [
        332, 6260, 2800, 4071, 583,  # face
        3216, 3226, 3387, 6617, 6624, 6787,  # feet
        2746, 2319, 2445, 2556, 2673,  # left hand tips
        6191, 5782, 5905, 6016, 6133,  # right hand tips
    ],
    dtype=np.int32,
)
NUM_OUTPUT_JOINTS = NUM_JOINTS + len(EXTRA_JOINT_VERTEX_IDS)  # 45

_P = jax.lax.Precision.HIGHEST
# 3-pass bf16 (~f32-equivalent mantissa via error correction) for the large
# blendshape/skinning matmuls: 2x faster than the 6-pass HIGHEST, relative
# error ~2^-21 — far below marker noise (mm-scale on meter-scale data).
_P_BLEND = jax.lax.Precision.HIGH


class _StaticArray:
    """Immutable, hashable numpy array wrapper for pytree aux data (jit
    compile-cache keys need hashable metadata)."""

    __slots__ = ("array", "_hash")

    def __init__(self, array: np.ndarray):
        self.array = np.asarray(array)
        self.array.setflags(write=False)
        self._hash = hash((self.array.shape, self.array.dtype.str, self.array.tobytes()))

    def __eq__(self, other):
        return (
            isinstance(other, _StaticArray)
            and self._hash == other._hash
            and self.array.shape == other.array.shape
            and bool(np.array_equal(self.array, other.array))
        )

    def __hash__(self):
        return self._hash


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BodyModel:
    """SMPL model tensors (a pytree, so it can cross jit boundaries)."""

    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, 10]
    posedirs: jnp.ndarray  # [207, V*3]
    j_regressor: jnp.ndarray  # [24, V]
    lbs_weights: jnp.ndarray  # [V, 24]
    faces: np.ndarray  # [Faces, 3] int32 (static aux data)
    parents: np.ndarray = dataclasses.field(default_factory=lambda: PARENTS)
    gender: str = "neutral"
    # content hash computed at BUILD time from the host-side numpy arrays.
    # The AOT program cache keys on model contents (solver/aot.py); without
    # this, fingerprinting a device-committed model reads ~19 MB back from
    # the TPU over the tunnel — measured at 280 s of pure readback in
    # MultiSequenceSolver construction.  None (e.g. ad-hoc test models)
    # falls back to hashing the tensor values.
    content_fp: Optional[str] = None
    # per-tensor content shas aligned with tree_flatten's children order,
    # computed at build time alongside content_fp.  solver/aot.py seeds its
    # hoisted-constant store with (sha -> committed device tensor) so loaded
    # AOT programs reuse the on-device model instead of re-uploading ~19 MB
    # over the tunnel (measured 339 s in a slow tunnel phase).
    const_shas: Optional[Tuple[str, ...]] = None

    def tree_flatten(self):
        children = (self.v_template, self.shapedirs, self.posedirs, self.j_regressor, self.lbs_weights)
        aux = (_StaticArray(self.faces), _StaticArray(self.parents), self.gender,
               self.content_fp, self.const_shas)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        v_template, shapedirs, posedirs, j_regressor, lbs_weights = children
        faces, parents, gender, content_fp, const_shas = aux
        return cls(v_template, shapedirs, posedirs, j_regressor, lbs_weights,
                   faces.array, parents.array, gender, content_fp, const_shas)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    def vertex_part_labels(self) -> jnp.ndarray:
        """argmax LBS weight per vertex -> joint id [V] (reference
        ``optimization.py:689``, ``markers_utils.py:440-441``)."""
        return jnp.argmax(self.lbs_weights, axis=-1)


class _ChumpyUnpickler(pickle.Unpickler):
    """Decode chumpy-pickled SMPL assets without chumpy installed.

    Chumpy arrays subclass ndarray; we map them to plain ndarray-compatible
    stubs so ``np.asarray`` recovers the data (SURVEY.md §7 hard part 7).
    """

    def find_class(self, module: str, name: str):
        if module.startswith("chumpy"):
            class _Ch(np.ndarray):
                pass

            return _Ch
        if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
            import scipy.sparse

            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


def host_model_fingerprint(*arrays: np.ndarray) -> str:
    """Content hash of host-side model arrays (shape+dtype+bytes), computed
    BEFORE the tensors are committed to a device — the cheap counterpart of
    ``solver.aot.model_fingerprint``'s value hash."""
    h = hashlib.sha256()
    for arr in arrays:
        a = np.asarray(arr)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def host_const_shas(*arrays: np.ndarray) -> Tuple[str, ...]:
    """Per-tensor content shas (solver/aot.py's hoisted-constant keying),
    computed from the host-side arrays at build time in tree_flatten child
    order; see BodyModel.const_shas."""
    from uuo_mocap_tpu.solver.aot import const_sha

    return tuple(const_sha(np.asarray(a)) for a in arrays)


# Host-side numpy copies of the five model tensors, keyed by content_fp in
# tree_flatten child order.  Data tooling (data/synthetic._surface_points_fn)
# needs a CPU-backend copy of the model; without this registry its only
# source is the committed device tensors, and a TPU->host read of ~19 MB
# over the axon tunnel is seconds in the best case and WEDGES the client in
# the worst (2026-08-20: bench datagen hung >14 min inside device_put while
# a concurrent fresh process's small transfers completed fine).  The
# constructors hold the numpy sources anyway, so they register them here.
HOST_CONST_NAMES = ("v_template", "shapedirs", "posedirs", "j_regressor", "lbs_weights")
# Bounded (ADVICE r4): each entry pins ~19 MB of host numpy for as long as
# it lives; typical runs load 1-3 models, so an 8-entry LRU is effectively
# unbounded for real workloads while capping a pathological many-model
# service at ~150 MB.  Insertion order IS recency order (dict semantics;
# re-registration moves to the back).
_HOST_CONSTS: Dict[str, Tuple[np.ndarray, ...]] = {}
_HOST_CONSTS_MAX = 8


def register_host_consts(content_fp: Optional[str], arrays: Tuple[np.ndarray, ...]) -> None:
    """Record the host-side model tensors (HOST_CONST_NAMES order) for a
    build-time fingerprint; no-op without a fingerprint."""
    if content_fp:
        _HOST_CONSTS.pop(content_fp, None)
        _HOST_CONSTS[content_fp] = tuple(np.asarray(a) for a in arrays)
        while len(_HOST_CONSTS) > _HOST_CONSTS_MAX:
            _HOST_CONSTS.pop(next(iter(_HOST_CONSTS)))


def host_consts(model: "BodyModel") -> Optional[Dict[str, np.ndarray]]:
    """name -> host numpy tensor for a registered model, else None (the
    caller falls back to reading the device tensors).

    Guard (ADVICE r4): the registry is keyed by content_fp, which is
    computed at build time — a hand-constructed BodyModel reusing a
    registered fp with different tensors would otherwise silently receive
    the wrong host arrays.  Each registered array's shape/dtype must match
    the model's device tensor; any mismatch returns None (device fallback)."""
    arrs = _HOST_CONSTS.get(model.content_fp) if model.content_fp else None
    if arrs is None:
        return None
    for name, a in zip(HOST_CONST_NAMES, arrs):
        t = getattr(model, name)
        if tuple(a.shape) != tuple(t.shape) or a.dtype != np.dtype(t.dtype.name):
            return None
    return dict(zip(HOST_CONST_NAMES, arrs))


def _to_dense(x: Any) -> np.ndarray:
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_body_model(path: str, gender: str = "neutral", dtype=jnp.float32) -> BodyModel:
    """Load a body model from an SMPL pkl (as shipped by smpl.is.tue.mpg.de,
    the format the reference ingests via ``smplx.create``, README.md:18-33)
    or an npz with the same field names.
    """
    if os.path.isdir(path):
        # smplx-style layout: <path>/smpl/SMPL_{GENDER}.pkl
        cand = os.path.join(path, "smpl", f"SMPL_{gender.upper()}.pkl")
        if not os.path.exists(cand):
            cand = os.path.join(path, f"SMPL_{gender.upper()}.pkl")
        path = cand

    if path.endswith(".npz"):
        data: Dict[str, Any] = dict(np.load(path, allow_pickle=False))
    else:
        with open(path, "rb") as f:
            data = _ChumpyUnpickler(f, encoding="latin1").load()

    v_template = _to_dense(data["v_template"]).astype(np.float32)  # [V, 3]
    shapedirs = _to_dense(data["shapedirs"]).astype(np.float32)[:, :, :NUM_BETAS]  # [V, 3, 10]
    posedirs = _to_dense(data["posedirs"]).astype(np.float32)  # [V, 3, 207]
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [207, V*3] (smplx layout)
    j_regressor = _to_dense(data["J_regressor"]).astype(np.float32)  # [24, V]
    lbs_weights = _to_dense(data["weights"]).astype(np.float32)  # [V, 24]
    faces = _to_dense(data.get("f", data.get("faces"))).astype(np.int32)  # [13776, 3]
    parents = data.get("kintree_table")
    if parents is not None:
        parents = np.asarray(parents)
        if parents.ndim == 2:  # kintree_table [2, J]
            parents = parents[0].astype(np.int64)
            parents[0] = -1
        parents = parents.astype(np.int32)
    else:
        parents = PARENTS

    np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name)
    host = tuple(a.astype(np_dtype, copy=False) for a in
                 (v_template, shapedirs, posedirs, j_regressor, lbs_weights))
    content_fp = host_model_fingerprint(*host)
    register_host_consts(content_fp, host)
    return BodyModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        faces=faces,
        parents=parents,
        gender=gender,
        content_fp=content_fp,
        const_shas=host_const_shas(*host),
    )


def _compose_kinematic_chain(
    rot_mats: jnp.ndarray,  # [..., 24, 3, 3]
    joints_rest: jnp.ndarray,  # [..., 24, 3]
    parents: np.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the (static, depth<=7) SMPL tree.

    Returns posed joint positions [..., 24, 3] and the per-joint rigid
    transforms [..., 24, 3, 4] relative to the rest pose (the "A" matrices of
    LBS).  The tree is static so the chain unrolls to 23 fused 3x3 matmuls —
    no scan/scatter, XLA-friendly.
    """
    rel = joints_rest - jnp.where(
        (parents >= 0)[:, None], joints_rest[..., np.maximum(parents, 0), :], 0.0
    )  # [..., 24, 3]; root keeps absolute position

    # Level-batched composition: joints at the same tree depth compose in one
    # batched einsum against their (already computed) parents — 2 ops per
    # depth level (~8 for SMPL) instead of 2 per joint (46), which matters
    # because these are launch-bound [.., 3, 3] kernels.
    J = len(parents)
    depth = np.zeros(J, np.int64)
    for j in range(1, J):
        depth[j] = depth[int(parents[j])] + 1
    levels = [np.where(depth == d)[0] for d in range(int(depth.max()) + 1)]

    R_w_parts = {0: rot_mats[..., 0, :, :]}
    t_w_parts = {0: rel[..., 0, :]}
    R_acc = jnp.zeros(rot_mats.shape[:-3] + (J, 3, 3), rot_mats.dtype)
    t_acc = jnp.zeros(rot_mats.shape[:-3] + (J, 3), rot_mats.dtype)
    R_acc = R_acc.at[..., 0, :, :].set(R_w_parts[0])
    t_acc = t_acc.at[..., 0, :].set(t_w_parts[0])
    for level in levels[1:]:
        p_idx = parents[level]
        R_p = jnp.take(R_acc, p_idx, axis=-3)  # [..., L, 3, 3]
        t_p = jnp.take(t_acc, p_idx, axis=-2)
        M = jnp.take(rot_mats, level, axis=-3)
        r = jnp.take(rel, level, axis=-2)
        # elementwise 3x3 compose (exact f32 on the VPU; also sidesteps an
        # XLA simplifier mis-shape on batched 3x3 dots with >=3 batch dims)
        R_l = jnp.sum(R_p[..., :, :, None] * M[..., None, :, :], axis=-2)
        t_l = t_p + jnp.sum(R_p * r[..., None, :], axis=-1)
        R_acc = R_acc.at[..., level, :, :].set(R_l)
        t_acc = t_acc.at[..., level, :].set(t_l)
    R_w = R_acc  # [..., 24, 3, 3]
    t_w = t_acc  # [..., 24, 3]

    # LBS relative transform: translation part t - R @ j_rest
    t_rel = t_w - jnp.sum(R_w * joints_rest[..., None, :], axis=-1)
    A = jnp.concatenate([R_w, t_rel[..., None]], axis=-1)  # [..., 24, 3, 4]
    return t_w, A


def lbs_forward(
    model: BodyModel,
    pose_body: jnp.ndarray,  # [..., 23, 3, 3]
    betas: jnp.ndarray,  # [..., 10]
    root_orient: jnp.ndarray,  # [..., 1, 3, 3]
    trans: jnp.ndarray,  # [..., 3]
    with_pose_blendshapes: bool = True,
) -> Dict[str, jnp.ndarray]:
    """SMPL forward pass, batched over arbitrary leading dims.

    Mirrors the reference's ``SmplInference.__call__`` contract
    (``utils/smpl.py:29-50``): rotation-matrix pose input (pose2rot=False),
    returns ``joints`` [..., 45, 3] and ``vertices`` [..., 6890, 3].

    The compute shape: three MXU matmuls dominate —
      pose blendshapes  [B, 207] @ [207, V*3]
      joint regression  [24, V]  @ [B*V, 3]
      skinning          [V, 24]  @ [B, 24, 12]
    plus an unrolled 24-node kinematic chain of 3x3 ops.
    """
    batch_shape = trans.shape[:-1]
    dtype = model.v_template.dtype

    betas = jnp.broadcast_to(betas, batch_shape + (NUM_BETAS,)).astype(dtype)
    # Shape blendshapes: v_shaped = template + shapedirs . betas
    # (NOTE: XLA's batched einsum beats hand-flattened 2D matmuls here —
    # explicit [B,10]@[10,V*3] + transposes measured 30% slower.)
    v_shaped = model.v_template + jnp.einsum(
        "vdk,...k->...vd", model.shapedirs, betas, precision=_P_BLEND
    )  # [..., V, 3]

    # Rest joints from the regressor
    joints_rest = jnp.einsum("jv,...vd->...jd", model.j_regressor, v_shaped, precision=_P_BLEND)  # [..., 24, 3]

    rot_mats = jnp.concatenate([root_orient, pose_body], axis=-3)  # [..., 24, 3, 3]

    # Pose blendshapes from (R - I) of the 23 body joints
    if with_pose_blendshapes:
        ident = jnp.eye(3, dtype=dtype)
        pose_feature = (pose_body - ident).reshape(batch_shape + (NUM_POSE_JOINTS * 9,))
        pose_offsets = jnp.einsum(
            "...p,pc->...c", pose_feature, model.posedirs, precision=_P_BLEND
        ).reshape(batch_shape + (model.num_vertices, 3))
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = _compose_kinematic_chain(rot_mats, joints_rest, model.parents)

    # Skinning, laid out for the TPU: tensors shaped [..., V, 3, 4] put tiny
    # dims on the (sublane, lane) tile and XLA pads them 8x128 — a ~30x HBM
    # blowup at V=6890.  Instead flatten the per-joint transforms to 12 and
    # keep V on the lane axis: T_flat [..., 12, V], elementwise combines on
    # [..., V]-minor tensors only.
    A_flat = A.reshape(batch_shape + (NUM_JOINTS, 12))  # row-major (a, b): c = 4a + b
    T_flat = jnp.einsum("...jc,vj->...cv", A_flat, model.lbs_weights, precision=_P_BLEND)  # [..., 12, V]
    vp_t = jnp.swapaxes(v_posed, -1, -2)  # [..., 3, V]
    rows = []
    for a in range(3):
        row = (
            T_flat[..., 4 * a + 0, :] * vp_t[..., 0, :]
            + T_flat[..., 4 * a + 1, :] * vp_t[..., 1, :]
            + T_flat[..., 4 * a + 2, :] * vp_t[..., 2, :]
            + T_flat[..., 4 * a + 3, :]
        )
        rows.append(row)
    verts = jnp.stack(rows, axis=-1)  # [..., V, 3]

    verts = verts + trans[..., None, :]
    posed_joints = posed_joints + trans[..., None, :]

    extra = verts[..., EXTRA_JOINT_VERTEX_IDS, :]  # [..., 21, 3]
    joints_out = jnp.concatenate([posed_joints, extra], axis=-2)  # [..., 45, 3]

    return {"joints": joints_out, "vertices": verts}


def lbs_forward_at(
    model: BodyModel,
    pose_body: jnp.ndarray,  # [..., 23, 3, 3]
    betas: jnp.ndarray,  # [..., 10]
    root_orient: jnp.ndarray,  # [..., 1, 3, 3]
    trans: jnp.ndarray,  # [..., 3]
    vertex_ids: jnp.ndarray,  # [M] or [..., M] int
) -> Dict[str, jnp.ndarray]:
    """SMPL forward evaluated ONLY at ``vertex_ids`` — the sparse-gradient
    companion of ``lbs_forward``.

    The solver's chamfer/marker losses touch ~M (tens) of the V=6890
    vertices per evaluation; differentiating through the dense forward makes
    XLA scatter the cotangent into a [.., V, 3] buffer (measured ~11 ms of
    the 33 ms canonical closure — the single hottest op).  Evaluating the
    LBS pipeline on GATHERED rows (template/shapedirs/posedirs/weights at
    the selected ids) gives bit-equal positions with an O(M) backward.

    Rest joints come from precontracting the regressor with the shape basis
    (j_regressor @ shapedirs, [24, 3, 10]) so no full-V tensor appears
    anywhere.  Returns {"points" [..., M, 3], "joints" [..., 24, 3]}.
    """
    batch_shape = trans.shape[:-1]
    dtype = model.v_template.dtype
    V = model.num_vertices
    betas = jnp.broadcast_to(betas, batch_shape + (NUM_BETAS,)).astype(dtype)

    # rest joints without v_shaped: jr @ template + (jr @ shapedirs) . betas
    j_template = jnp.einsum("jv,vd->jd", model.j_regressor, model.v_template, precision=_P_BLEND)
    j_shapedirs = jnp.einsum("jv,vdk->jdk", model.j_regressor, model.shapedirs, precision=_P_BLEND)
    joints_rest = j_template + jnp.einsum("jdk,...k->...jd", j_shapedirs, betas, precision=_P_BLEND)

    rot_mats = jnp.concatenate([root_orient, pose_body], axis=-3)
    posed_joints, A = _compose_kinematic_chain(rot_mats, joints_rest, model.parents)

    # gathered per-vertex model rows (vertex_ids may carry batch dims)
    v_t_sel = model.v_template[vertex_ids]  # [..., M, 3]
    sh_sel = model.shapedirs[vertex_ids]  # [..., M, 3, 10]
    w_sel = model.lbs_weights[vertex_ids]  # [..., M, 24]
    v_shaped = v_t_sel + jnp.einsum("...mdk,...k->...md", sh_sel, betas, precision=_P_BLEND)

    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (pose_body - ident).reshape(batch_shape + (NUM_POSE_JOINTS * 9,))
    # posedirs rows per vertex: [V, 3, 207] view, gathered to [..., M, 3, 207]
    posedirs_v = jnp.transpose(model.posedirs.reshape(NUM_POSE_JOINTS * 9, V, 3), (1, 2, 0))
    pd_sel = posedirs_v[vertex_ids]
    v_posed = v_shaped + jnp.einsum("...mdp,...p->...md", pd_sel, pose_feature, precision=_P_BLEND)

    A_flat = A.reshape(batch_shape + (NUM_JOINTS, 12))
    T_sel = jnp.einsum("...mj,...jc->...mc", w_sel, A_flat, precision=_P_BLEND)  # [..., M, 12]
    T_sel = T_sel.reshape(T_sel.shape[:-1] + (3, 4))
    points = (
        jnp.einsum("...mab,...mb->...ma", T_sel[..., :3], v_posed, precision=_P_BLEND)
        + T_sel[..., 3]
    )
    points = points + trans[..., None, :]
    return {"points": points, "joints": posed_joints + trans[..., None, :]}
