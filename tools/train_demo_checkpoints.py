"""Train and ship the demo checkpoints the network/SDF pipeline modes load.

The reference assumes pretrained ``.pth`` checkpoints it never ships
(``markers_utils.py:45-48`` for the segmenters, ``utils/sdf.py:15-26`` for
Pos2BC/PosDiff); our training loops exist (``models/train.py``) but round 3
shipped no weights, so network/SDF modes were wired-but-unvalidated
(VERDICT r3 item 10).  This tool trains all four on synthetic AMASS-style
sequences from the body model, evaluates each on HELD-OUT data, writes flax
msgpack checkpoints under ``checkpoints/`` (the directory the pipeline
reads by default), and records the held-out metrics in
``checkpoints/MANIFEST.json`` — the quality gate
``tests/test_demo_checkpoints.py`` asserts against the SHIPPED files.

Pos2BC's 7.2M params are stored float16 (halves repo weight);
``models.checkpoints.load_params`` casts back to the template dtype.

Usage:  JAX_PLATFORMS=cpu python tools/train_demo_checkpoints.py [--steps N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Round-4 trained on CPU (the datagen was eager per-step host work and every
# tiny eager op costs a ~0.4 s compile over the TPU tunnel) which capped the
# run at 600 steps.  Round 5: datagen is POOLED on the CPU backend once and
# the training steps are lax.scan-packed jitted calls — so the optimizer
# runs on the accelerator when one is present (10-30x the CPU step rate).
# UUO_TRAIN_PLATFORM=cpu forces the old all-CPU mode.
if os.environ.get("UUO_TRAIN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["UUO_TRAIN_PLATFORM"])
_CPU = None  # set in main(): the CPU device the body model lives on

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.models import train as T
from uuo_mocap_tpu.models.checkpoints import save_params
from uuo_mocap_tpu.models.marker_segmenter import MarkerSegmenter
from uuo_mocap_tpu.models.marker_segmenter_multimodal import MarkerSegmenterMultimodal
from uuo_mocap_tpu.models.pos2bc import Pos2BC
from uuo_mocap_tpu.models.pos_diff import PosDiff

HELD_OUT_SEED = 777_001  # never used by the training streams


def _heldout_seg_batches(body, batches=4, num_markers=41, layout=None):
    """Held-out batches, generated on the CPU backend (eager datagen) and
    returned as host numpy so the accelerator-side apply can consume them.
    ``layout``: evaluate on a named capture layout's vertices instead of
    random ones (the regime network mode serves on real datasets)."""
    vids = None
    if layout:
        from uuo_mocap_tpu.data.marker_layout import resolve_layout_vertex_ids

        vids = np.asarray(resolve_layout_vertex_ids(layout, body))
    out = []
    with jax.default_device(_CPU):
        for b in range(batches):
            pts, labels, jts = T._segmentation_batch(
                body, 8, num_markers, seed=HELD_OUT_SEED + b, vertex_ids=vids)
            out.append((np.asarray(pts), np.asarray(labels), np.asarray(jts)))
    return out


def eval_segmenter(body, params, multimodal, batches=4, num_markers=41, layout=None):
    model = MarkerSegmenterMultimodal() if multimodal else MarkerSegmenter()
    correct = total = 0
    # evals run on the CPU backend: the eval-batch shape triggers a libtpu
    # fusion-pass CHECK crash ("TransformWindow: Loop will not make
    # progress" on bf16[8,41,256] — 2026-08-20, v5e remote_compile SIGABRT)
    # that the training-batch shape does not; the nets are ~1MB, CPU evals
    # cost seconds
    params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    with jax.default_device(_CPU):
        apply = jax.jit(model.apply)
        for pts, labels, jts in _heldout_seg_batches(body, batches, num_markers, layout):
            logits = apply(params, pts, jts) if multimodal else apply(params, pts)
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            correct += int((pred == labels).sum())
            total += labels.size
    return correct / total


def majority_class_baseline(body, batches=4, num_markers=41):
    """Accuracy of always predicting the most common part — the honest
    'chance' level on this torso-heavy mesh (NOT 1/24)."""
    counts = np.zeros(24, np.int64)
    for _, labels, _ in _heldout_seg_batches(body, batches, num_markers):
        counts += np.bincount(labels.ravel(), minlength=24)
    return counts.max() / counts.sum()


def eval_pos2bc(body, params, n=2048):
    """Mean distance between the net's soft-assignment expected position and
    the true surface sample (the quantity the SDF stage consumes).  CPU
    backend, same rationale as eval_segmenter."""
    model = Pos2BC(num_vertices=body.num_vertices)
    params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    with jax.default_device(_CPU):
        pts, _, _ = T._surface_samples(body, n, seed=HELD_OUT_SEED)
        probs = jax.nn.softmax(model.apply(params, pts), axis=-1)
        expected = probs @ jnp.asarray(np.asarray(body.v_template))  # [n, 3]
        return float(jnp.mean(jnp.linalg.norm(expected - pts, axis=-1)))


def eval_pos_diff(body, params, n=2048, noise=0.05):
    """Projection quality: mean distance-to-surface of held-out noised
    queries BEFORE and AFTER applying the net's displacement (the quantity
    the SDF marker stage relies on; reference ``utils/sdf.py:47-78``)."""
    from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance

    model = PosDiff()
    params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    with jax.default_device(_CPU):
        q, _ = T.pos_diff_pool(body, n, noise, HELD_OUT_SEED)
        pred = np.asarray(model.apply(params, jnp.asarray(q)))
        verts = jnp.asarray(np.asarray(body.v_template))
        faces = jnp.asarray(np.asarray(body.faces))
        fn = jax.jit(lambda p: point_mesh_distance(p, verts, faces)["distance"])

        def mean_dist(pts):
            return float(np.mean(np.concatenate([
                np.asarray(fn(jnp.asarray(pts[c:c + 512]))) for c in range(0, n, 512)])))

        return mean_dist(q + pred), mean_dist(q)


def main():
    global _CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=int(os.environ.get("UUO_TRAIN_STEPS", "8000")))
    ap.add_argument("--batch", type=int, default=int(os.environ.get("UUO_TRAIN_BATCH", "32")))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints"))
    args = ap.parse_args()

    _CPU = jax.local_devices(backend="cpu")[0]
    # the body model lives on the CPU backend: datagen consumes it eagerly,
    # and a 19 MB TPU->host readback over the tunnel can wedge the client
    with jax.default_device(_CPU):
        body = synthetic_body_model()
    print(f"training backend: {jax.default_backend()}, steps={args.steps}, "
          f"batch={args.batch}", flush=True)
    manifest = {"steps": args.steps, "batch": args.batch,
                "generator": "models/train.py pooled synthetic streams"}

    t0 = time.time()
    params, hist = T.train_marker_segmenter(body, steps=args.steps, batch=args.batch)
    acc = eval_segmenter(body, params, multimodal=False)
    acc_lay = eval_segmenter(body, params, multimodal=False, layout="cmu_41")
    base = majority_class_baseline(body)
    save_params(params, args.out, "marker_segmenter")
    manifest["marker_segmenter"] = {
        "held_out_accuracy": round(acc, 4),
        "held_out_accuracy_cmu41_layout": round(acc_lay, 4),
        "majority_class_baseline": round(base, 4),
        "final_train_loss": round(hist[-1], 4),
    }
    print(f"marker_segmenter: acc={acc:.3f} / cmu_41 {acc_lay:.3f} (baseline {base:.3f}) "
          f"loss={hist[-1]:.3f} [{time.time() - t0:.0f}s]", flush=True)

    t0 = time.time()
    params, hist = T.train_marker_segmenter_multimodal(body, steps=args.steps, batch=args.batch)
    acc_mm = eval_segmenter(body, params, multimodal=True)
    acc_mm_lay = eval_segmenter(body, params, multimodal=True, layout="cmu_41")
    save_params(params, args.out, "marker_segmenter_multimodal")
    manifest["marker_segmenter_multimodal"] = {
        "held_out_accuracy": round(acc_mm, 4),
        "held_out_accuracy_cmu41_layout": round(acc_mm_lay, 4),
        "majority_class_baseline": round(base, 4),
        "final_train_loss": round(hist[-1], 4),
    }
    print(f"marker_segmenter_multimodal: acc={acc_mm:.3f} / cmu_41 {acc_mm_lay:.3f} "
          f"loss={hist[-1]:.3f} [{time.time() - t0:.0f}s]", flush=True)

    t0 = time.time()
    params, hist = T.train_pos2bc(body, steps=args.steps)
    err = eval_pos2bc(body, params)
    params_f16 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float16), params)
    save_params(params_f16, args.out, "barycentric_coords/pos2bc")
    manifest["barycentric_coords/pos2bc"] = {
        "held_out_expected_point_err_m": round(err, 4),
        "final_train_loss": round(hist[-1], 4),
        "stored_dtype": "float16",
    }
    print(f"pos2bc: expected-point err={err * 100:.2f}cm loss={hist[-1]:.3f} "
          f"[{time.time() - t0:.0f}s]", flush=True)

    t0 = time.time()
    params, hist = T.train_pos_diff(body, steps=args.steps, pool_n=65536)
    d_after, d_before = eval_pos_diff(body, params)
    save_params(params, args.out, "barycentric_coords/pos_diff")
    reduction = 1.0 - d_after / max(d_before, 1e-9)
    manifest["barycentric_coords/pos_diff"] = {
        "held_out_surface_dist_before_m": round(d_before, 4),
        "held_out_surface_dist_after_m": round(d_after, 4),
        "held_out_dist_reduction": round(reduction, 4),
        "final_train_loss": round(hist[-1], 6),
    }
    print(f"pos_diff: surface dist {d_before * 100:.2f}cm -> {d_after * 100:.2f}cm "
          f"({reduction:.0%} reduction) [{time.time() - t0:.0f}s]", flush=True)

    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
