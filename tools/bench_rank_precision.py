"""Ranking-pass precision experiment: speed AND argmin agreement on TPU.

The chamfer stage's per-eval cost is dominated by the no-grad ranking pass
(`pipeline/stages.py:_ranked_nearest` — dense [C, M, V] distance + argmin,
~2/3 of the sparse closure; Benchmarks.md round-4 fused-LBS table).  The
ranking runs `Precision.HIGHEST` (6-pass bf16 emulation of the f32 cross
term).  This tool measures, at the production closure shape, what each
cheaper variant buys and costs:

  * speed: full production closure (`_sparse_chamfer` value+grad, vmapped
    to lane width W) under each `UUO_RANK_PRECISION` setting;
  * accuracy: argmin agreement vs HIGHEST on realistic geometry (markers
    ~1 cm off-surface), plus the d2 penalty and picked-vertex separation
    where they disagree.

Usage: python tools/bench_rank_precision.py [W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 16
F, M = 450, 41

import numpy as np
import jax
import jax.numpy as jnp

import uuo_mocap_tpu.pipeline.stages as st
from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.pipeline.stages import SmplParams
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.ops import rotations as rot

model = synthetic_body_model()
rng = np.random.RandomState(0)

pose6d = jnp.asarray(
    np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 23, 1))
    + rng.randn(W, F, 23, 6).astype(np.float32) * 0.05)
root = jnp.broadcast_to(jnp.eye(3), (W, F, 1, 3, 3))
trans = jnp.asarray(rng.randn(W, F, 3).astype(np.float32) * 0.2
                    + np.array([2.0, 0.5, 1.0], np.float32))
betas = jnp.asarray(rng.randn(W, 1, 10).astype(np.float32) * 0.1)

# markers at random vertices + ~1 cm offsets — the regime where near-
# equidistant candidates are real (not uniform noise meters off-surface)
pose0 = rot.rotation_6d_to_matrix(pose6d[0])
verts0 = lbs_forward(model, pose0, jnp.zeros((F, 10)), root[0], trans[0])["vertices"]
V = verts0.shape[1]
mi = rng.randint(0, V, size=M)
markers = jnp.stack([
    lbs_forward(model, rot.rotation_6d_to_matrix(pose6d[w]),
                jnp.zeros((F, 10)), root[w], trans[w])["vertices"][:, mi]
    for w in range(W)
]) + jnp.asarray(rng.randn(W, F, M, 3).astype(np.float32)) * 0.01
weights = jnp.ones((W, F, M), jnp.float32)


def closure():
    def one_lane(p6, b, r, t, mk, w):
        sp = SmplParams(rot.rotation_6d_to_matrix(p6), b[0], r, t)
        return st._sparse_chamfer(model, sp, mk, w)

    def loss(p6, b, r, t, mk, w):
        return jnp.sum(jax.vmap(one_lane)(p6, b, r, t, mk, w))

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3)))


def rank_lane0():
    # fresh lambda per call: a module-level function object would hit JAX's
    # GLOBAL jit trace cache across precision settings and silently return
    # the first precision's indices (observed: a bogus 100% agreement)
    def f(p6, b, r, t, mk):
        sp = SmplParams(rot.rotation_6d_to_matrix(p6), b[0], r, t)
        sv = lbs_forward(model, sp.pose_body, jnp.broadcast_to(sp.betas, (F, 10)),
                         sp.root_orient, sp.trans)["vertices"]
        return st._ranked_nearest(mk, sv), sv

    return jax.jit(f)(pose6d[0], betas[0], root[0], trans[0], markers[0])


results = {}
for prec in ["highest", "high", "default", "bf16"]:
    st._RANK_PRECISION = prec
    g = closure()
    v, _ = g(pose6d, betas, root, trans, markers, weights)
    jax.block_until_ready(v)
    t0, N = time.time(), 25
    for _ in range(N):
        v, grads = g(pose6d, betas, root, trans, markers, weights)
    jax.block_until_ready(grads)
    dt = (time.time() - t0) / N * 1000
    idx, verts = rank_lane0()
    jax.block_until_ready(idx)
    results[prec] = (dt, np.asarray(idx), np.asarray(verts), float(v))
    print(f"{prec:8s}: {dt:7.2f} ms/call  {dt/W:6.3f} ms/lane-eval  loss={float(v):.4f}")

hi_idx, hi_v = results["highest"][1], results["highest"][2]
mk = np.asarray(markers[0])
for prec in ["high", "default", "bf16"]:
    ix = results[prec][1]
    agree = (hi_idx == ix).mean()
    m = hi_idx != ix
    take = lambda vv, ii: np.take_along_axis(vv, ii[..., None], axis=-2)
    d2h = ((mk - take(hi_v, hi_idx)) ** 2).sum(-1)
    d2x = ((mk - take(hi_v, ix)) ** 2).sum(-1)
    gaps = (d2x - d2h)[m]
    sep = np.linalg.norm((take(hi_v, hi_idx) - take(hi_v, ix))[m], axis=-1)
    extra = (f"  d2 penalty mean {gaps.mean():.2e} max {gaps.max():.2e} m^2"
             f"  vertex sep mean {sep.mean()*1000:.1f} max {sep.max()*1000:.1f} mm"
             if m.any() else "")
    print(f"{prec:8s}: agreement {agree*100:.3f}%{extra}")
