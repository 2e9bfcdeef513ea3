"""Measure-or-retire the fused-Pallas-LBS lead (VERDICT r3 item 7).

The open question since round 2: would one Pallas kernel fusing the dense
LBS forward with the nearest-vertex ranking pass (keeping [F, V, 3]
vertices in VMEM instead of round-tripping HBM between two programs) beat
the production sparse-chamfer closure?

This tool bounds the answer WITHOUT writing the kernel, by measuring at
the canonical closure shape (W=4 lanes, F=450, M=41, V=6890):

  1. dense LBS forward alone             (writes [W,F,V,3] to HBM)
  2. ranking pass alone on resident verts (reads [W,F,V,3] from HBM)
  3. LBS forward + ranking jitted as ONE program (XLA's own fusion shot)
  4. the production sparse closure fwd+bwd (what a fused kernel must beat)

A perfect fusion can at best eliminate the HBM round-trip of the
intermediate: ceiling_saving = (1)+(2) - max over the compute-bound parts,
bounded below by |(3) - ((1)+(2))| already captured by XLA.  The tool
prints the measured ms plus the roofline bytes/time of the intermediate at
v5e HBM bandwidth so the verdict is arithmetic, not vibes.

Usage: python tools/bench_fused_lbs.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
W, F, M = 4, 450, 41
HBM_GBPS = 819.0  # v5e spec

import numpy as np
import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.body.model import lbs_forward, lbs_forward_at
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.pipeline import stages as S

model = synthetic_body_model()
V = int(model.v_template.shape[0])
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


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.time() - t0) / REPS
    print(f"{name:48s} {ms:8.2f} ms", flush=True)
    return out, ms


# ---- 1. dense LBS forward alone ----------------------------------------
fwd = jax.jit(jax.vmap(verts_of))
verts, ms_fwd = timeit("1. dense LBS forward", fwd, pose6d, betas, root6d, trans)

# ---- 2. ranking alone on resident vertices -----------------------------
rank = jax.jit(jax.vmap(lambda m, v: S._ranked_nearest(m, v)))
_, ms_rank = timeit("2. ranking pass (verts resident)", rank, markers, verts)

# ---- 3. LBS + ranking as one jitted program ----------------------------
fused = jax.jit(jax.vmap(
    lambda p6, b, r6, t, m: S._ranked_nearest(m, verts_of(p6, b, r6, t))))
_, ms_fused = timeit("3. LBS+ranking one program (XLA fusion)",
                     fused, pose6d, betas, root6d, trans, markers)

# ---- 4. production sparse closure fwd+bwd ------------------------------
def closure(p6, b, r6, t, m, w):
    pose = rot.rotation_6d_to_matrix(p6)
    root = rot.rotation_6d_to_matrix(r6)
    sg = jax.lax.stop_gradient
    v_ng = lbs_forward(model, sg(pose), jnp.broadcast_to(sg(b), (F, 10)),
                       sg(root), sg(t))["vertices"]
    idx = S._ranked_nearest(m, v_ng)
    at = lbs_forward_at(model, pose, jnp.broadcast_to(b, (F, 10)), root, t, idx)
    d2 = jnp.sum((m - at["points"]) ** 2, axis=-1)
    return jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1e-12)


grad = jax.jit(jax.vmap(jax.value_and_grad(closure, argnums=(0, 1, 2, 3)),
                        in_axes=(0, 0, 0, 0, 0, 0)))
_, ms_closure = timeit("4. sparse closure fwd+bwd (production)",
                       grad, pose6d, betas, root6d, trans, markers, weights)

# ---- roofline of the intermediate --------------------------------------
inter_bytes = W * F * V * 3 * 4  # [W,F,V,3] f32
rt_ms = 2.0 * inter_bytes / (HBM_GBPS * 1e9) * 1e3  # write + read
xla_already = ms_fwd + ms_rank - ms_fused
print()
print(f"intermediate [W,F,V,3] = {inter_bytes / 1e6:.0f} MB; "
      f"HBM write+read roofline = {rt_ms:.2f} ms @ {HBM_GBPS:.0f} GB/s")
print(f"XLA already saves (1)+(2)-(3) = {xla_already:.2f} ms in the one-program form")
ceiling = max(rt_ms - xla_already, 0.0)
print(f"remaining fusion ceiling ~= {ceiling:.2f} ms "
      f"({100.0 * ceiling / ms_closure:.1f}% of the {ms_closure:.1f} ms closure)")
