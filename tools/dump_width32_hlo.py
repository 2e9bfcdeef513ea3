"""Distill the width-32 crash program to StableHLO WITHOUT executing it.

The (24, 32]-width L-BFGS chamfer segment program kills the TPU worker on
first execution (docs/tpu_worker_crash_width32.md).  Re-running the crash
wedges the shared tunnel for minutes-to-hours, so this tool only LOWERS the
distilled program (client-side tracing -> StableHLO; no device contact):

  vmap over W=32 lanes of run_lbfgs_segment( sparse-chamfer closure )
  at the canonical shapes F=450, M=41, V=6890

and writes ``docs/width32_segment.stablehlo.txt.gz`` plus an op histogram
to stdout — the program structure a compiler team needs to triage the
crash, produced safely.

Usage: JAX_PLATFORMS=cpu python tools/dump_width32_hlo.py [W]
"""
import collections
import gzip
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 32

import jax

jax.config.update("jax_platforms", "cpu")  # lowering only; never executes

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from uuo_mocap_tpu.body.model import lbs_forward  # noqa: E402
from uuo_mocap_tpu.body.synthetic import synthetic_body_model  # noqa: E402
from uuo_mocap_tpu.ops import rotations as rot  # noqa: E402
from uuo_mocap_tpu.ops.chamfer import masked_chamfer  # noqa: E402
from uuo_mocap_tpu.solver.lbfgs import (  # noqa: E402
    LbfgsOptions, lbfgs_init, run_lbfgs_segment)

# canonical crash shapes by default; UUO_DUMP_F/M shrink them for a small
# committable structural dump (the op structure is shape-independent)
F = int(os.environ.get("UUO_DUMP_F", "450"))
M = int(os.environ.get("UUO_DUMP_M", "41"))
model = synthetic_body_model()
rng = np.random.RandomState(0)

markers = jnp.asarray(rng.randn(W, F, M, 3).astype(np.float32))
weights = jnp.ones((W, F, M), jnp.float32)
pose6d0 = jnp.asarray(
    np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (W, F, 23, 1)))


def closure(x, mk, wt):
    pose = rot.rotation_6d_to_matrix(x.reshape(F, 23, 6))
    root = jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3))
    out = lbs_forward(model, pose, jnp.zeros((F, 10)), root, jnp.zeros((F, 3)))
    return masked_chamfer(mk, out["vertices"], wt) * 10.0


opts = LbfgsOptions()


def seg_one(x0, mk, wt):
    st = lbfgs_init(lambda x: closure(x, mk, wt), x0, opts)
    return run_lbfgs_segment(lambda x: closure(x, mk, wt), st, opts, 50)


x0 = pose6d0.reshape(W, -1)
lowered = jax.jit(jax.vmap(seg_one)).lower(x0, markers, weights)
text = lowered.as_text()
# elide large dense constant literals (the embedded body-model tensors are
# ~39 MB of hex text and irrelevant to the crash structure)
text = re.sub(r'dense<"0x[0-9A-Fa-f]{256,}"', 'dense<"0xELIDED"', text)
text = re.sub(r"dense<\[[^>]{256,}?\]>", "dense<ELIDED>", text)

hist = collections.Counter(
    m.group(1) for m in re.finditer(r"= \"?(stablehlo\.\w+|func\.call|call)", text))
print(f"distilled segment program W={W} F={F} M={M} V={model.v_template.shape[0]}")
print(f"stablehlo text: {len(text) / 1e6:.1f} MB, "
      f"while ops: {hist.get('stablehlo.while', 0)}, "
      f"top ops: {hist.most_common(12)}")

out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", f"width{W}_segment.stablehlo.txt.gz")
with gzip.open(out_path, "wt") as f:
    f.write(text)
print(f"wrote {out_path} ({os.path.getsize(out_path) / 1e6:.1f} MB gz)")
