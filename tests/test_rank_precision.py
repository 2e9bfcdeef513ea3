"""Ranking-pass precision tiers (UUO_RANK_PRECISION / `stages._RANK_PRECISION`).

The chamfer stage ranks nearest vertices on a stop-gradient forward; the
tier controls the matmul precision of that rank-only distance product
(`ops/chamfer.py:squared_distance_matrix`).  TPU measurements live in
Benchmarks.md (round 4: HIGH = 99.4% argmin agreement at −18% closure
cost; DEFAULT/bf16 = ~34%/29% agreement, accuracy-gate FAIL).  On the CPU
backend matmul precision is a no-op, so here we lock the CONTRACT, not the
TPU numerics:

  * every tier traces and returns a valid [F, M] int ranking;
  * f32-input tiers agree exactly on CPU (precision is ignored there);
  * the bf16 tier really quantizes (its distances differ from f32's);
  * the chunked (F > chunk) and direct paths agree within each tier.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import uuo_mocap_tpu.pipeline.stages as st
from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.body.model import lbs_forward
from uuo_mocap_tpu.ops import rotations as rot


@pytest.fixture(scope="module")
def geometry():
    body = synthetic_body_model()
    rng = np.random.RandomState(3)
    F = st._RANK_FRAME_CHUNK + 9  # force the lax.map chunked path
    pose6d = jnp.asarray(
        np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (F, 23, 1))
        + rng.randn(F, 23, 6).astype(np.float32) * 0.05)
    root = jnp.broadcast_to(jnp.eye(3), (F, 1, 3, 3))
    trans = jnp.asarray(rng.randn(F, 3).astype(np.float32) * 0.2
                        + np.array([2.0, 0.5, 1.0], np.float32))
    verts = lbs_forward(body, rot.rotation_6d_to_matrix(pose6d),
                        jnp.zeros((F, 10)), root, trans)["vertices"]
    mi = rng.randint(0, verts.shape[1], size=16)
    markers = verts[:, mi] + jnp.asarray(
        rng.randn(F, 16, 3).astype(np.float32)) * 0.01
    return markers, verts


def _ranked(markers, verts, tier):
    old = st._RANK_PRECISION
    st._RANK_PRECISION = tier
    try:
        return np.asarray(st._ranked_nearest(markers, verts))
    finally:
        st._RANK_PRECISION = old


@pytest.mark.parametrize("tier", ["highest", "high", "default", "bf16"])
def test_every_tier_traces_and_ranks(geometry, tier):
    markers, verts = geometry
    idx = _ranked(markers, verts, tier)
    assert idx.shape == markers.shape[:-1]
    assert np.issubdtype(idx.dtype, np.integer)
    assert (idx >= 0).all() and (idx < verts.shape[-2]).all()


def test_f32_tiers_agree_on_cpu(geometry):
    markers, verts = geometry
    base = _ranked(markers, verts, "highest")
    for tier in ["high", "default"]:
        assert (base == _ranked(markers, verts, tier)).all(), tier


def test_bf16_tier_quantizes(geometry):
    markers, verts = geometry
    from uuo_mocap_tpu.ops.chamfer import squared_distance_matrix
    d_f32 = squared_distance_matrix(markers[0], verts[0])
    d_b16 = squared_distance_matrix(markers[0], verts[0],
                                    compute_dtype=jnp.bfloat16)
    assert d_b16.dtype == jnp.bfloat16
    # quantization is real: bf16 distances differ from the exact ones
    assert float(jnp.max(jnp.abs(d_f32 - d_b16.astype(jnp.float32)))) > 0


def test_chunked_matches_direct(geometry):
    markers, verts = geometry
    C = st._RANK_FRAME_CHUNK
    for tier in ["highest", "high"]:
        full = _ranked(markers, verts, tier)
        head = _ranked(markers[:C], verts[:C], tier)  # direct (F <= chunk)
        assert (full[:C] == head).all(), tier
