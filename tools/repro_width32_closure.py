"""Minimal reproducer probe for the 32-wide chamfer-program TPU worker crash.

Runs the bare stage closure (value+grad of the sparse-chamfer objective) at
increasing lane widths W. Usage: python tools/repro_width32_closure.py <W>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 32
F, M = 450, 41

import numpy as np
import jax
import jax.numpy as jnp

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.ops.chamfer import masked_chamfer
from uuo_mocap_tpu.ops import rotations as rot

model = synthetic_body_model()
rng = np.random.RandomState(0)

pose6d = jnp.asarray(np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 23, 1))
                     + rng.randn(W, F, 23, 6).astype(np.float32) * 0.01)
root6d = jnp.asarray(np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 1, 1)))
trans = jnp.asarray(rng.randn(W, F, 3).astype(np.float32) * 0.1)
betas = jnp.asarray(rng.randn(W, 1, 10).astype(np.float32) * 0.1)
markers = jnp.asarray(rng.randn(W, F, M, 3).astype(np.float32))
weights = jnp.ones((W, F, M), jnp.float32)


def one_lane(p6, b, r6, t, mk, w):
    pose = rot.rotation_6d_to_matrix(p6)
    root = rot.rotation_6d_to_matrix(r6)
    out = lbs_forward(model, pose, jnp.broadcast_to(b, (F, 10)), root, t)
    return masked_chamfer(mk, out["vertices"], w) * 10.0


def loss(p6, b, r6, t, mk, w):
    return jnp.sum(jax.vmap(one_lane)(p6, b, r6, t, mk, w))


g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3)))
t0 = time.time()
v, _ = g(pose6d, betas, root6d, trans, markers, weights)
jax.block_until_ready(v)
print(f"W={W}: first call ok {time.time()-t0:.1f}s loss={float(v):.3f}")
t0 = time.time()
for _ in range(5):
    v, grads = g(pose6d, betas, root6d, trans, markers, weights)
jax.block_until_ready(grads)
print(f"W={W}: 5 cached calls {time.time()-t0:.1f}s — NO CRASH")
