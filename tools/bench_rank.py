"""Microbench: nearest-vertex ranking pass, XLA vs Pallas frame-blocked kernel.

Times at the canonical closure shape (W=4 hypothesis lanes, F=450 frames,
M=41 markers, V=6890 vertices):
  1. the ranking pass alone (no-grad dense forward excluded), and
  2. the full sparse-chamfer closure fwd+bwd with each ranking backend
     (toggled by monkeypatching ``stages._RANK_PALLAS`` before trace).

Usage: python tools/bench_rank.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
W, F, M = 4, 450, 41

import numpy as np
import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline import stages as S

model = synthetic_body_model()
V = model.v_template.shape[0]
rng = np.random.RandomState(0)

pose6d = jnp.asarray(np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 23, 1))
                     + rng.randn(W, F, 23, 6).astype(np.float32) * 0.01)
root6d = jnp.asarray(np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 1, 1)))
trans = jnp.asarray(rng.randn(W, F, 3).astype(np.float32) * 0.1)
betas = jnp.asarray(rng.randn(W, 1, 10).astype(np.float32) * 0.1)
markers = jnp.asarray(rng.randn(W, F, M, 3).astype(np.float32))
weights = jnp.ones((W, F, M), jnp.float32)


def verts_of(p6, b, r6, t):
    pose = rot.rotation_6d_to_matrix(p6)
    root = rot.rotation_6d_to_matrix(r6)
    return lbs_forward(model, pose, jnp.broadcast_to(b, (F, 10)), root, t)["vertices"]


verts = jax.jit(jax.vmap(verts_of))(pose6d, betas, root6d, trans)
jax.block_until_ready(verts)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.time() - t0) / REPS
    print(f"{name:40s} {ms:8.2f} ms")
    return out, ms


# ---- 1. ranking pass alone --------------------------------------------------
S._RANK_PALLAS = False
rank_xla = jax.jit(jax.vmap(lambda m, v: S._ranked_nearest(m, v)))
idx_x, _ = timeit("rank XLA (chunked argmin)", rank_xla, markers, verts)

S._RANK_PALLAS = True
rank_pl = jax.jit(jax.vmap(lambda m, v: S._ranked_nearest(m, v)))
idx_p, _ = timeit("rank Pallas (frame-blocked)", rank_pl, markers, verts)

agree = float(jnp.mean((idx_x == idx_p).astype(jnp.float32)))
print(f"argmin agreement: {agree:.6f}")

# ---- 1b. V-tiled running argmin: avoid materializing [C, M, V] to HBM -------
def make_vtile(C, VT, precision, mode="matmul"):
    def ranked_vtile(markers, verts):
        F_, M_ = markers.shape[0], markers.shape[1]
        V_ = verts.shape[1]
        Vp = ((V_ + VT - 1) // VT) * VT
        bias = jnp.where(jnp.arange(Vp) < V_, 0.0, 1e30).astype(jnp.float32)
        if Vp != V_:
            # pad by repeating the last vertex (keeps centroids/numerics
            # sane); the bias keeps pads from ever winning the argmin
            verts = jnp.concatenate(
                [verts, jnp.broadcast_to(verts[:, -1:], (F_, Vp - V_, 3))], axis=1)
        Fp = ((F_ + C - 1) // C) * C
        if Fp != F_:
            pad = Fp - F_
            markers = jnp.concatenate([markers, jnp.zeros((pad, M_, 3))], 0)
            verts = jnp.concatenate([verts, jnp.zeros((pad, Vp, 3))], 0)
        K = Fp // C

        def one_chunk(mv):
            m_c, v_c = mv  # [C, M, 3], [C, Vp, 3]
            cen = jnp.mean(v_c, axis=1, keepdims=True)
            m_c = m_c - cen
            v_c = v_c - cen
            m2 = jnp.sum(m_c * m_c, -1)  # [C, M]

            def tile(i, carry):
                bv, bi = carry
                v_t = jax.lax.dynamic_slice_in_dim(v_c, i * VT, VT, 1)
                b_t = jax.lax.dynamic_slice_in_dim(bias, i * VT, VT, 0)
                if mode == "matmul":
                    y2 = jnp.sum(v_t * v_t, -1)  # [C, VT]
                    xy = jnp.einsum("cmd,cvd->cmv", m_c, v_t, precision=precision)
                    d2 = m2[..., None] + (y2 + b_t)[:, None, :] - 2.0 * xy
                else:  # direct squared-diff reduction (VPU, f32-exact)
                    d2 = jnp.sum(
                        (m_c[:, :, None, :] - v_t[:, None, :, :]) ** 2, -1
                    ) + b_t[None, None, :]
                tmin = jnp.min(d2, -1)
                targ = (jnp.argmin(d2, -1) + i * VT).astype(jnp.int32)
                take = tmin < bv
                return jnp.where(take, tmin, bv), jnp.where(take, targ, bi)

            init = (jnp.full((C, M_), jnp.inf, jnp.float32),
                    jnp.zeros((C, M_), jnp.int32))
            _, idx = jax.lax.fori_loop(0, Vp // VT, tile, init)
            return idx

        idx = jax.lax.map(one_chunk, (markers.reshape(K, C, M_, 3),
                                      verts.reshape(K, C, Vp, 3)))
        return idx.reshape(Fp, M_)[:F_]

    return ranked_vtile


VARIANTS = [
    ("matmul HIGHEST C=64 VT=1152", 64, 1152, jax.lax.Precision.HIGHEST, "matmul"),
    ("matmul default C=64 VT=1152", 64, 1152, None, "matmul"),
    ("matmul HIGH    C=64 VT=1152", 64, 1152, jax.lax.Precision.HIGH, "matmul"),
    ("direct f32     C=64 VT=1152", 64, 1152, None, "direct"),
    ("direct f32     C=64 VT=576", 64, 576, None, "direct"),
    ("direct f32     C=32 VT=1152", 32, 1152, None, "direct"),
    ("direct f32     C=128 VT=2304", 128, 2304, None, "direct"),
    ("direct f32     C=450 VT=1152", 450, 1152, None, "direct"),
]
for name, C, VT, prec, mode in VARIANTS:
    fn = jax.jit(jax.vmap(make_vtile(C, VT, prec, mode)))
    idx_v, _ = timeit(f"rank vtile {name}", fn, markers, verts)
    agree = float(jnp.mean((idx_x == idx_v).astype(jnp.float32)))
    print(f"  agreement vs XLA: {agree:.6f}")

# ---- 1c. hierarchical coarse-to-fine ranking ---------------------------------
# Agreement is measured on BOTH marker distributions: random points (the
# harness default above) and surface-proximal points (vertices + cm-scale
# noise — the distribution the solver actually ranks once roughly aligned).
from uuo_mocap_tpu.ops.rank_hier import build_rank_table, hierarchical_nearest

vids = rng.randint(0, V, size=(W, F, M))
verts_np = np.asarray(verts)
surf_markers = jnp.asarray(
    np.take_along_axis(verts_np, vids[..., None], axis=2)
    + rng.randn(W, F, M, 3).astype(np.float32) * 0.02
)
idx_surf_x = rank_xla(surf_markers, verts)

for C_, R_, P_ in ((640, 10, 2), (640, 10, 1), (512, 12, 2), (896, 8, 2)):
    table = build_rank_table(np.asarray(model.v_template), num_coarse=C_,
                             num_cell_neighbors=R_, top_p=P_)
    fn = jax.jit(jax.vmap(lambda m, v: hierarchical_nearest(m, v, table)))
    label = f"rank hier C={C_} R={R_} P={P_} K={table.cand_ids.shape[1]}"
    idx_h, _ = timeit(label, fn, markers, verts)
    agree = float(jnp.mean((idx_x == idx_h).astype(jnp.float32)))
    # distance error of the disagreeing picks (ties/near-ties are harmless)
    d_x = jnp.sqrt(jnp.sum((markers - jnp.take_along_axis(
        verts[:, :, :], idx_x[..., None].repeat(3, -1), axis=2)) ** 2, -1) + 1e-18)
    d_h = jnp.sqrt(jnp.sum((markers - jnp.take_along_axis(
        verts[:, :, :], idx_h[..., None].repeat(3, -1), axis=2)) ** 2, -1) + 1e-18)
    rel = float(jnp.max(jnp.abs(d_h - d_x) / jnp.maximum(d_x, 1e-9)))
    print(f"  agreement vs XLA: {agree:.6f}  max rel distance err: {rel:.2e}")
    idx_hs = fn(surf_markers, verts)
    agree_s = float(jnp.mean((idx_surf_x == idx_hs).astype(jnp.float32)))
    d_xs = jnp.sqrt(jnp.sum((surf_markers - jnp.take_along_axis(
        verts, idx_surf_x[..., None].repeat(3, -1), axis=2)) ** 2, -1) + 1e-18)
    d_hs = jnp.sqrt(jnp.sum((surf_markers - jnp.take_along_axis(
        verts, idx_hs[..., None].repeat(3, -1), axis=2)) ** 2, -1) + 1e-18)
    rel_s = float(jnp.max(jnp.abs(d_hs - d_xs) / jnp.maximum(d_xs, 1e-9)))
    print(f"  surface markers:  {agree_s:.6f}  max rel distance err: {rel_s:.2e}")

# ---- 2. full sparse closure fwd+bwd -----------------------------------------
def closure(p6, b, r6, t, mk, w):
    sp = S.SmplParams(
        pose_body=rot.rotation_6d_to_matrix(p6),
        betas=b,
        root_orient=rot.rotation_6d_to_matrix(r6),
        trans=t,
    )
    return S._sparse_chamfer(model, sp, mk, w) * 10.0


def loss(p6, b, r6, t, mk, w):
    return jnp.sum(jax.vmap(closure)(p6, b, r6, t, mk, w))


for flag, name in ((False, "closure XLA rank"), (True, "closure Pallas rank")):
    S._RANK_PALLAS = flag
    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3)))
    (v, grads), ms = timeit(name + " fwd+bwd", lambda *a: g(*a), pose6d, betas, root6d,
                            trans, markers, weights)
    print(f"  loss={float(v):.4f}")
