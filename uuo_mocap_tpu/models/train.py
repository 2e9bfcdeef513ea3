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


def _segmentation_batch(model: BodyModel, batch: int, num_markers: int, seed: int,
                        vertex_ids: np.ndarray | None = None):
    """Synthetic training batch: marker windows + part labels (+ joints).

    Markers are random surface vertices of posed bodies (or the fixed
    ``vertex_ids`` — e.g. a named capture layout); the label is the
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
    if vertex_ids is not None:
        vid = np.broadcast_to(np.asarray(vertex_ids), (batch, len(vertex_ids))).copy()
    else:
        vid = np.stack([rng.choice(model.num_vertices, num_markers, replace=False)
                        for _ in range(batch)])
    pts, jts = _lbs_markers(model, pose, betas, root, trans, jnp.asarray(vid))
    return pts, jnp.asarray(vertex_labels[vid]), jts


def _segmentation_pool(model: BodyModel, n_seqs: int, verts_per_seq: int, seed: int):
    """Pregenerated marker-trajectory pool for the segmenter loops.

    Per-step host datagen capped the round-4 checkpoints at 600 steps
    (held-out accuracy 38% — VERDICT r4 item 4).  Instead: generate
    ``n_seqs`` posed sequences ONCE, each with ``verts_per_seq`` tracked
    surface vertices, and let the (fully jitted) training step sample
    marker subsets + augmentations from the device-resident pool.

    Returns host arrays (pts [P, W, K, 3], labels [P, K], joints
    [P, W, 22, 3]); ~40 MB at the default 192x512.
    """
    import hashlib
    import os

    # disk cache: generation is host-bound (measured 13-190 s for 48-64
    # sequences on this shared 1-vCPU host) while a load is <1 s; the
    # segmenter and multimodal-segmenter runs share one pool.  INPUTS only,
    # keyed by shape/seed + generator-source hash (same policy as bench.py).
    with open(__file__, "rb") as f:
        src_h = hashlib.sha256(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".cache", "train_data")
    cache_path = os.path.join(
        cache_dir, f"segpool_p{n_seqs}_k{verts_per_seq}_s{seed}_w{WINDOW}_{src_h}.npz")
    if os.path.exists(cache_path):
        try:
            z = np.load(cache_path)
            return z["pts"], z["labels"], z["jts"]
        except Exception:
            pass  # corrupt/partial: regenerate

    rng = np.random.RandomState(seed)
    vertex_labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
    F = WINDOW
    # prefix every sequence's tracked-vertex set with the cmu_41 capture
    # layout: the training step draws either the layout columns or random
    # columns per element, so one pool trains both the layout-starved and
    # the real-capture regime (the regime network mode actually serves)
    try:
        from uuo_mocap_tpu.data.marker_layout import resolve_layout_vertex_ids

        layout_vids = np.asarray(resolve_layout_vertex_ids("cmu_41", model))
    except Exception:
        layout_vids = np.zeros((0,), np.int64)
    pts_all, lab_all, jts_all = [], [], []
    chunk = 8
    # datagen stays on the CPU backend: random_pose_sequence issues a couple
    # of eager ops per sequence, each a ~0.4 s compile over a tunneled TPU
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        for c0 in range(0, n_seqs, chunk):
            B = min(chunk, n_seqs - c0)
            gts = [random_pose_sequence(F, seed=seed * 100_003 + c0 + b,
                                        yaw=rng.uniform(0, 6.28)) for b in range(B)]
            pose = jnp.stack([g.pose_body for g in gts])
            betas = jnp.stack([jnp.broadcast_to(g.betas, (F, 10)) for g in gts])
            root = jnp.stack([g.root_orient for g in gts])
            trans = jnp.stack([g.trans for g in gts])
            vid = np.stack([np.concatenate([
                layout_vids,
                rng.choice(model.num_vertices, verts_per_seq - len(layout_vids),
                           replace=False)]) for _ in range(B)])
            p, j = _lbs_markers(model, pose, betas, root, trans, jnp.asarray(vid))
            pts_all.append(np.asarray(p))
            jts_all.append(np.asarray(j))
            lab_all.append(vertex_labels[vid])
    pts, labels, jts = (np.concatenate(pts_all), np.concatenate(lab_all),
                        np.concatenate(jts_all))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, pts=pts, labels=labels, jts=jts)
        os.replace(tmp, cache_path)
    except OSError:
        pass
    return pts, labels, jts


def _yaw_about_y(angle: jnp.ndarray) -> jnp.ndarray:
    """[...,] -> [..., 3, 3] rotation about the model's up axis (y)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def _make_pooled_seg_step(model_def, opt, pool, batch: int, num_markers: int,
                          multimodal: bool, marker_noise: float = 0.002,
                          inner: int = 1):
    """Jitted (params, opt_state, key) -> (params, opt_state, last_loss):
    runs ``inner`` optimizer steps per call via ``lax.scan`` (one dispatch
    amortizes the tunneled-TPU call latency across many steps).  Each step
    samples a batch of sequences + marker columns from the device-resident
    pool and augments (random yaw about up, random translation, marker
    jitter) before the Adam update."""
    import optax as _optax

    pts_pool = jnp.asarray(pool[0])
    lab_pool = jnp.asarray(pool[1])
    jts_pool = jnp.asarray(pool[2])
    P, W, K, _ = pts_pool.shape

    # columns 0..40 of the pool lead with the cmu_41 layout vertices (see
    # _segmentation_pool); half of each batch trains on exactly those
    layout_cols = min(41, K)

    def one_step(carry, key):
        params, opt_state = carry
        ks, kc, ky, kt, kn, kl = jax.random.split(key, 6)
        si = jax.random.randint(ks, (batch,), 0, P)
        ci = jax.random.randint(kc, (batch, num_markers), 0, K)
        if num_markers <= layout_cols:
            use_layout = jax.random.bernoulli(kl, 0.5, (batch, 1))
            ci_layout = jnp.broadcast_to(jnp.arange(num_markers), (batch, num_markers))
            ci = jnp.where(use_layout, ci_layout, ci)
        pts = jax.vmap(lambda p, c: p[:, c])(pts_pool[si], ci)  # [B, W, M, 3]
        labels = jax.vmap(lambda l, c: l[c])(lab_pool[si], ci)  # [B, M]
        jts = jts_pool[si]  # [B, W, 22, 3]
        R = _yaw_about_y(jax.random.uniform(ky, (batch,), minval=0.0, maxval=6.2832))
        t_off = jax.random.uniform(kt, (batch, 1, 1, 3), minval=-0.5, maxval=0.5)
        pts = jnp.einsum("bij,bwmj->bwmi", R, pts) + t_off
        jts = jnp.einsum("bij,bwmj->bwmi", R, jts) + t_off
        pts = pts + jax.random.normal(kn, pts.shape) * marker_noise

        def loss_fn(params):
            logits = (model_def.apply(params, pts, jts) if multimodal
                      else model_def.apply(params, pts))
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            return _optax.softmax_cross_entropy(logits, onehot).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (_optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def step(params, opt_state, key):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), jax.random.split(key, inner))
        return params, opt_state, losses[-1]

    return step


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


def _train_segmenter_pooled(model, init_params, body, steps, batch, num_markers,
                            lr, seed, pool_seqs, verts_per_seq, multimodal):
    pool = _segmentation_pool(body, pool_seqs, verts_per_seq, seed=seed + 41)
    # params may have been initialized on the CPU backend (the body model
    # lives there when training runs on an accelerator); re-home them to the
    # default device so the jitted step isn't fed mixed-committed args
    init_params = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), init_params)
    sched = optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(init_params)
    inner = max(1, min(50, steps // 4))
    step = _make_pooled_seg_step(model, opt, pool, batch, num_markers, multimodal,
                                 inner=inner)
    params = init_params
    history: List[float] = []
    key = jax.random.PRNGKey(seed * 2 + 1)
    for _ in range(max(1, steps // inner)):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        history.append(float(loss))
    return params, history


def train_marker_segmenter(
    body: BodyModel, steps: int = 200, batch: int = 8, num_markers: int = 41,
    lr: float = 1e-3, seed: int = 0, pool_seqs: int = 192, verts_per_seq: int = 512,
    latent_dim: int = 128,
) -> Tuple[dict, List[float]]:
    model = MarkerSegmenter(latent_dim=latent_dim)
    rng = jax.random.PRNGKey(seed)
    pts0, _, _ = _segmentation_batch(body, 1, num_markers, seed=9999)
    params = model.init(rng, pts0)
    return _train_segmenter_pooled(model, params, body, steps, batch, num_markers,
                                   lr, seed, pool_seqs, verts_per_seq, multimodal=False)


def train_marker_segmenter_multimodal(
    body: BodyModel, steps: int = 200, batch: int = 8, num_markers: int = 41,
    lr: float = 1e-3, seed: int = 0, pool_seqs: int = 192, verts_per_seq: int = 512,
    latent_dim: int = 128,
) -> Tuple[dict, List[float]]:
    model = MarkerSegmenterMultimodal(latent_dim=latent_dim)
    rng = jax.random.PRNGKey(seed)
    pts0, _, jts0 = _segmentation_batch(body, 1, num_markers, seed=9999)
    params = model.init(rng, pts0, jts0)
    return _train_segmenter_pooled(model, params, body, steps, batch, num_markers,
                                   lr, seed, pool_seqs, verts_per_seq, multimodal=True)


def _fit_pooled(params, loss_from_key, steps: int, lr: float, seed: int):
    """Jitted-sampling analog of ``_fit``: each step consumes a PRNG key and
    draws its batch from device-resident pools inside the jit; ``lax.scan``
    packs many steps per dispatch (tunneled-TPU call latency)."""
    sched = optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    inner = max(1, min(50, steps // 4))

    def one_step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_from_key)(params, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def step(params, opt_state, key):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), jax.random.split(key, inner))
        return params, opt_state, losses[-1]

    history: List[float] = []
    key = jax.random.PRNGKey(seed * 2 + 1)
    for _ in range(max(1, steps // inner)):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        history.append(float(loss))
    return params, history


def train_pos2bc(body: BodyModel, steps: int = 300, batch: int = 512, lr: float = 1e-3,
                 seed: int = 0, pool_n: int = 65536) -> Tuple[dict, List[float]]:
    model = Pos2BC(num_vertices=body.num_vertices)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3)))
    pts_p, fv_p, bary_p = _surface_samples(body, pool_n, seed * 104729 + 7)

    def loss_from_key(params, key):
        idx = jax.random.randint(key, (batch,), 0, pool_n)
        pts, face_vids, bary = pts_p[idx], fv_p[idx], bary_p[idx]
        logits = model.apply(params, pts)  # [n, V]
        # soft target: barycentric mass on the 3 face vertices
        target = jnp.zeros_like(logits)
        rows = jnp.arange(pts.shape[0])[:, None].repeat(3, 1)
        target = target.at[rows, face_vids].add(bary)
        return optax.softmax_cross_entropy(logits, target).mean()

    return _fit_pooled(params, loss_from_key, steps, lr, seed)


def pos_diff_pool(body: BodyModel, n: int, noise: float, seed: int,
                  chunk: int = 512):
    """(queries [n, 3], targets [n, 3]) for PosDiff: targets are the exact
    displacement to the NEAREST surface point (closed-form point-triangle
    projection, ``ops/point_mesh.py``) — the supervision the reference
    builds with igl signed-distance (``smplh_diff_dataset.py:84-94``).

    The round-4/5 shortcut (label a noised surface sample with minus its
    own noise) plateaus at ~20% residual reduction NO MATTER the net: the
    same query is generated by many offsets, so the MSE-optimal answer is
    an average over compatible surface patches, not the projection.  The
    projection IS a function of the query; nets fit it.  Disk-cached.
    """
    import hashlib
    import os

    from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance

    with open(__file__, "rb") as f:
        src_h = hashlib.sha256(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".cache", "train_data")
    cache_path = os.path.join(cache_dir, f"pdpool_n{n}_s{seed}_z{noise:g}_{src_h}.npz")
    if os.path.exists(cache_path):
        try:
            z = np.load(cache_path)
            return z["q"], z["tgt"]
        except Exception:
            pass

    pts, _, _ = _surface_samples(body, n, seed)
    rng = np.random.RandomState(seed ^ 0xA5A5)
    q = np.asarray(pts) + rng.randn(n, 3).astype(np.float32) * noise
    verts = jnp.asarray(np.asarray(body.v_template))
    faces = jnp.asarray(np.asarray(body.faces))  # jnp: indexed by a tracer in-jit
    fn = jax.jit(lambda p: point_mesh_distance(p, verts, faces)["closest_point"])
    cp = np.concatenate([np.asarray(fn(jnp.asarray(q[c0:c0 + chunk])))
                         for c0 in range(0, n, chunk)])
    tgt = cp - q
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, q=q, tgt=tgt)
        os.replace(tmp, cache_path)
    except OSError:
        pass
    return q, tgt


def train_pos_diff(body: BodyModel, steps: int = 300, batch: int = 512, lr: float = 1e-3,
                   noise: float = 0.05, seed: int = 0, pool_n: int = 4096) -> Tuple[dict, List[float]]:
    model = PosDiff()
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3)))
    q, tgt = pos_diff_pool(body, pool_n, noise, seed * 15485863 + 7)
    q_p, t_p = jnp.asarray(q), jnp.asarray(tgt)

    def loss_from_key(params, key):
        idx = jax.random.randint(key, (batch,), 0, pool_n)
        return jnp.mean((model.apply(params, q_p[idx]) - t_p[idx]) ** 2)

    return _fit_pooled(params, loss_from_key, steps, lr, seed)


def train_motion_embedding(
    body: BodyModel, steps: int = 200, batch: int = 16, window: int = 16,
    num_markers: int = 41, lr: float = 1e-3, seed: int = 0, temperature: float = 0.1,
    pool_seqs: int = 96,
) -> Tuple[Tuple[dict, dict], List[float]]:
    """InfoNCE between marker windows and joint windows of the same instant
    (the reference's contrastive alignment objective).  Pooled like the
    segmenter loops: per-step eager datagen made this the fast tier's
    single heaviest test (120 s for 100 steps)."""
    m_model = MarkerEmbedding()
    j_model = JointEmbedding()
    rng = jax.random.PRNGKey(seed)

    # one *independent* sequence per pool row — overlapping windows of a
    # single sequence make the InfoNCE targets ambiguous and the loss parks
    # at chance level ln(batch)
    rngnp = np.random.RandomState(seed * 13 + 1)
    pts_rows, jts_rows = [], []
    chunk = 8
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        for c0 in range(0, pool_seqs, chunk):
            B = min(chunk, pool_seqs - c0)
            gts = [random_pose_sequence(window, seed=seed * 100003 + c0 + b)
                   for b in range(B)]
            pose = jnp.stack([g.pose_body for g in gts])
            betas = jnp.stack([jnp.broadcast_to(g.betas, (window, 10)) for g in gts])
            root = jnp.stack([g.root_orient for g in gts])
            trans = jnp.stack([g.trans for g in gts])
            vid = np.stack([rngnp.choice(body.num_vertices, num_markers, replace=False)
                            for _ in range(B)])
            p, j = _lbs_markers(body, pose, betas, root, trans, jnp.asarray(vid))
            pts_rows.append(np.asarray(p))
            jts_rows.append(np.asarray(j))
    pts_pool = jnp.asarray(np.concatenate(pts_rows))  # [P, W, M, 3]
    jts_pool = jnp.asarray(np.concatenate(jts_rows))  # [P, W, 22, 3]

    m_params = m_model.init(rng, pts_pool[:1])
    j_params = j_model.init(rng, jts_pool[:1])
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)), {"m": m_params, "j": j_params})

    def loss_from_key(params, key):
        # sample WITHOUT replacement: a duplicated row is its own positive
        # pair twice and poisons the InfoNCE labels
        idx = jax.random.permutation(key, pool_seqs)[:batch]
        pts, jts = pts_pool[idx], jts_pool[idx]
        em = m_model.apply(params["m"], pts)  # [B, 32]
        ej = j_model.apply(params["j"], jts)
        logits = em @ ej.T / temperature
        labels = jnp.arange(batch)
        return (
            optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        ) / 2

    params, hist = _fit_pooled(params, loss_from_key, steps, lr, seed)
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
