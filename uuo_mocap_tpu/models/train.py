"""Training loops for the neural models.

The reference repo loads pretrained checkpoints but ships NO training code
(SURVEY.md §2.3: a ``video_mocap.train...`` module is imported by its vis
scripts but absent).  These loops train every model family on synthetic
data generated from the body model (random smooth pose sequences + virtual
markers — the same generator that backs the closed-loop tests), so the
network/SDF pipeline modes are usable out of the box.

Each ``train_*`` returns (params, metrics_history) and can persist via
``models.checkpoints.save_params``.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.data.synthetic import random_pose_sequence
from uuo_mocap_tpu.models.foot_contact_model import FootContactModel
from uuo_mocap_tpu.models.marker_segmenter import WINDOW, MarkerSegmenter
from uuo_mocap_tpu.models.marker_segmenter_multimodal import MarkerSegmenterMultimodal
from uuo_mocap_tpu.models.motion_embedding import JointEmbedding, MarkerEmbedding
from uuo_mocap_tpu.models.pos2bc import Pos2BC
from uuo_mocap_tpu.models.pos_diff import PosDiff


# --------------------------------------------------------------------- data
@jax.jit
def _lbs_markers(model, pose, betas, root, trans, vid):
    """One compiled LBS over the whole [B, W] batch + per-element marker
    gather (the eager per-sequence loop cost ~5 s/step on CPU — 25x the
    optimizer step it feeds)."""
    out = lbs_forward(model, pose, betas, root, trans)
    pts = jax.vmap(lambda v, i: v[:, i])(out["vertices"], vid)  # [B, W, M, 3]
    return pts, out["joints"][..., :22, :]


def _segmentation_batch(model: BodyModel, batch: int, num_markers: int, seed: int):
    """Synthetic training batch: marker windows + part labels (+ joints).

    Markers are random surface vertices of posed bodies; the label is the
    argmax-LBS part of the generating vertex (the supervision the reference
    trains from AMASS, ``datasets/dataset_mocap.py:109-151``).
    """
    rng = np.random.RandomState(seed)
    vertex_labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
    F = WINDOW
    gts = [random_pose_sequence(F, seed=seed * 1000 + b, yaw=rng.uniform(0, 6.28))
           for b in range(batch)]
    pose = jnp.stack([g.pose_body for g in gts])
    betas = jnp.stack([jnp.broadcast_to(g.betas, (F, 10)) for g in gts])
    root = jnp.stack([g.root_orient for g in gts])
    trans = jnp.stack([g.trans for g in gts])
    vid = np.stack([rng.choice(model.num_vertices, num_markers, replace=False)
                    for _ in range(batch)])
    pts, jts = _lbs_markers(model, pose, betas, root, trans, jnp.asarray(vid))
    return pts, jnp.asarray(vertex_labels[vid]), jts


def _surface_samples(model: BodyModel, n: int, seed: int):
    """Random barycentric samples on the template surface: positions +
    soft vertex assignment targets (Pos2BC supervision; reference
    ``datasets/smplh_dataset.py:74-117``)."""
    rng = np.random.RandomState(seed)
    faces = model.faces
    v = np.asarray(model.v_template)
    fidx = rng.randint(0, faces.shape[0], n)
    bary = rng.dirichlet((1.0, 1.0, 1.0), size=n).astype(np.float32)
    tri = v[faces[fidx]]  # [n, 3, 3]
    pts = np.einsum("nk,nkd->nd", bary, tri)
    return jnp.asarray(pts), jnp.asarray(faces[fidx]), jnp.asarray(bary)


# ------------------------------------------------------------------- loops
def _fit(model_def, params, loss_fn, data_fn, steps: int, lr: float):
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history: List[float] = []
    for i in range(steps):
        batch = data_fn(i)
        params, opt_state, loss = step(params, opt_state, batch)
        history.append(float(loss))
    return params, history


def train_marker_segmenter(
    body: BodyModel, steps: int = 200, batch: int = 8, num_markers: int = 41,
    lr: float = 1e-3, seed: int = 0,
) -> Tuple[dict, List[float]]:
    model = MarkerSegmenter()
    rng = jax.random.PRNGKey(seed)
    pts0, _, _ = _segmentation_batch(body, 1, num_markers, seed=9999)
    params = model.init(rng, pts0)

    def loss_fn(params, batch):
        pts, labels, _ = batch
        logits = model.apply(params, pts)  # [B, M, C]
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return optax.softmax_cross_entropy(logits, onehot).mean()

    return _fit(model, params, loss_fn, lambda i: _segmentation_batch(body, batch, num_markers, seed * 7919 + i), steps, lr)


def train_marker_segmenter_multimodal(
    body: BodyModel, steps: int = 200, batch: int = 8, num_markers: int = 41,
    lr: float = 1e-3, seed: int = 0,
) -> Tuple[dict, List[float]]:
    model = MarkerSegmenterMultimodal()
    rng = jax.random.PRNGKey(seed)
    pts0, _, jts0 = _segmentation_batch(body, 1, num_markers, seed=9999)
    params = model.init(rng, pts0, jts0)

    def loss_fn(params, batch):
        pts, labels, jts = batch
        logits = model.apply(params, pts, jts)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return optax.softmax_cross_entropy(logits, onehot).mean()

    return _fit(model, params, loss_fn, lambda i: _segmentation_batch(body, batch, num_markers, seed * 7919 + i), steps, lr)


def train_pos2bc(body: BodyModel, steps: int = 300, batch: int = 512, lr: float = 1e-3,
                 seed: int = 0) -> Tuple[dict, List[float]]:
    model = Pos2BC(num_vertices=body.num_vertices)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3)))

    def data_fn(i):
        return _surface_samples(body, batch, seed * 104729 + i)

    def loss_fn(params, batch):
        pts, face_vids, bary = batch
        logits = model.apply(params, pts)  # [n, V]
        # soft target: barycentric mass on the 3 face vertices
        target = jnp.zeros_like(logits)
        rows = jnp.arange(pts.shape[0])[:, None].repeat(3, 1)
        target = target.at[rows, face_vids].add(bary)
        return optax.softmax_cross_entropy(logits, target).mean()

    return _fit(model, params, loss_fn, data_fn, steps, lr)


def train_pos_diff(body: BodyModel, steps: int = 300, batch: int = 512, lr: float = 1e-3,
                   noise: float = 0.05, seed: int = 0) -> Tuple[dict, List[float]]:
    model = PosDiff()
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3)))

    def data_fn(i):
        pts, _, _ = _surface_samples(body, batch, seed * 15485863 + i)
        rng = np.random.RandomState(seed * 31 + i)
        off = jnp.asarray(rng.randn(batch, 3).astype(np.float32) * noise)
        return pts + off, -off  # displaced point -> displacement back

    def loss_fn(params, batch):
        x, target = batch
        return jnp.mean((model.apply(params, x) - target) ** 2)

    return _fit(model, params, loss_fn, data_fn, steps, lr)


def train_motion_embedding(
    body: BodyModel, steps: int = 200, batch: int = 16, window: int = 16,
    num_markers: int = 41, lr: float = 1e-3, seed: int = 0, temperature: float = 0.1,
) -> Tuple[Tuple[dict, dict], List[float]]:
    """InfoNCE between marker windows and joint windows of the same instant
    (the reference's contrastive alignment objective)."""
    m_model = MarkerEmbedding()
    j_model = JointEmbedding()
    rng = jax.random.PRNGKey(seed)

    def make_batch(i):
        # one *independent* sequence per batch element — overlapping windows
        # of a single sequence make the InfoNCE targets ambiguous and the
        # loss parks at chance level ln(batch)
        rngnp = np.random.RandomState(seed * 13 + i)
        pts, jts = [], []
        for b in range(batch):
            gt = random_pose_sequence(window, seed=seed * 100003 + i * batch + b)
            out = lbs_forward(
                body, gt.pose_body, jnp.broadcast_to(gt.betas, (window, 10)), gt.root_orient, gt.trans
            )
            vid = rngnp.choice(body.num_vertices, num_markers, replace=False)
            pts.append(np.asarray(out["vertices"][:, vid]))
            jts.append(np.asarray(out["joints"][:, :22]))
        return jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(jts))

    pts0, jts0 = make_batch(9999)
    m_params = m_model.init(rng, pts0)
    j_params = j_model.init(rng, jts0)
    params = {"m": m_params, "j": j_params}

    def loss_fn(params, batch):
        pts, jts = batch
        em = m_model.apply(params["m"], pts)  # [B, 32]
        ej = j_model.apply(params["j"], jts)
        logits = em @ ej.T / temperature
        labels = jnp.arange(pts.shape[0])
        return (
            optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        ) / 2

    params, hist = _fit(None, params, loss_fn, make_batch, steps, lr)
    return (params["m"], params["j"]), hist


def train_foot_contact(
    body: BodyModel, steps: int = 200, batch: int = 8, frames: int = 64,
    lr: float = 1e-3, seed: int = 0,
) -> Tuple[dict, List[float]]:
    """Supervise against the 3D heuristic labels
    (``utils/foot_contact.py``) on synthetic sequences."""
    from uuo_mocap_tpu.utils.foot_contact import compute_foot_contacts

    model = FootContactModel()

    def make_batch(i):
        jts, labels = [], []
        for b in range(batch):
            gt = random_pose_sequence(frames, seed=seed * 19 + i * batch + b)
            F = frames
            out = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
            j = np.asarray(out["joints"][:, :22])
            jts.append(j)
            labels.append(compute_foot_contacts(j[None])[0])
        return jnp.asarray(np.stack(jts)), jnp.asarray(np.stack(labels))

    jts0, _ = make_batch(9999)
    params = model.init(jax.random.PRNGKey(seed), jts0)

    def loss_fn(params, batch):
        jts, labels = batch
        logits = model.apply(params, jts)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    return _fit(model, params, loss_fn, make_batch, steps, lr)
