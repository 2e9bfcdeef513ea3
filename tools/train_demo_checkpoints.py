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

# training is pure CPU work (small nets, synthetic data); the env var alone
# is NOT enough under the axon sitecustomize — set the config explicitly or
# every tiny eager datagen op pays a ~0.4 s TPU-tunnel compile
jax.config.update("jax_platforms", "cpu")

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


def eval_segmenter(body, params, multimodal, batches=4, num_markers=41):
    model = MarkerSegmenterMultimodal() if multimodal else MarkerSegmenter()
    correct = total = 0
    for b in range(batches):
        pts, labels, jts = T._segmentation_batch(body, 8, num_markers, seed=HELD_OUT_SEED + b)
        logits = model.apply(params, pts, jts) if multimodal else model.apply(params, pts)
        pred = jnp.argmax(logits, axis=-1)
        correct += int((pred == labels).sum())
        total += labels.size
    return correct / total


def majority_class_baseline(body, batches=4, num_markers=41):
    """Accuracy of always predicting the most common part — the honest
    'chance' level on this torso-heavy mesh (NOT 1/24)."""
    counts = np.zeros(24, np.int64)
    for b in range(batches):
        _, labels, _ = T._segmentation_batch(body, 8, num_markers, seed=HELD_OUT_SEED + b)
        counts += np.bincount(np.asarray(labels).ravel(), minlength=24)
    return counts.max() / counts.sum()


def eval_pos2bc(body, params, n=2048):
    """Mean distance between the net's soft-assignment expected position and
    the true surface sample (the quantity the SDF stage consumes)."""
    model = Pos2BC(num_vertices=body.num_vertices)
    pts, _, _ = T._surface_samples(body, n, seed=HELD_OUT_SEED)
    probs = jax.nn.softmax(model.apply(params, pts), axis=-1)
    expected = probs @ body.v_template  # [n, 3]
    return float(jnp.mean(jnp.linalg.norm(expected - pts, axis=-1)))


def eval_pos_diff(body, params, n=2048, noise=0.05):
    model = PosDiff()
    pts, _, _ = T._surface_samples(body, n, seed=HELD_OUT_SEED)
    rng = np.random.RandomState(HELD_OUT_SEED)
    off = jnp.asarray(rng.randn(n, 3).astype(np.float32) * noise)
    pred = model.apply(params, pts + off)
    resid = jnp.linalg.norm(pred + off, axis=-1)  # perfect -> 0
    return float(jnp.mean(resid)), float(jnp.mean(jnp.linalg.norm(off, axis=-1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=int(os.environ.get("UUO_TRAIN_STEPS", "600")))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints"))
    args = ap.parse_args()

    body = synthetic_body_model()
    manifest = {"steps": args.steps, "generator": "models/train.py synthetic streams"}

    t0 = time.time()
    params, hist = T.train_marker_segmenter(body, steps=args.steps)
    acc = eval_segmenter(body, params, multimodal=False)
    base = majority_class_baseline(body)
    save_params(params, args.out, "marker_segmenter")
    manifest["marker_segmenter"] = {
        "held_out_accuracy": round(acc, 4),
        "majority_class_baseline": round(base, 4),
        "final_train_loss": round(hist[-1], 4),
    }
    print(f"marker_segmenter: acc={acc:.3f} (baseline {base:.3f}) "
          f"loss={hist[-1]:.3f} [{time.time() - t0:.0f}s]", flush=True)

    t0 = time.time()
    params, hist = T.train_marker_segmenter_multimodal(body, steps=args.steps)
    acc_mm = eval_segmenter(body, params, multimodal=True)
    save_params(params, args.out, "marker_segmenter_multimodal")
    manifest["marker_segmenter_multimodal"] = {
        "held_out_accuracy": round(acc_mm, 4),
        "majority_class_baseline": round(base, 4),
        "final_train_loss": round(hist[-1], 4),
    }
    print(f"marker_segmenter_multimodal: acc={acc_mm:.3f} "
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
    params, hist = T.train_pos_diff(body, steps=args.steps)
    resid, off_mag = eval_pos_diff(body, params)
    save_params(params, args.out, "barycentric_coords/pos_diff")
    manifest["barycentric_coords/pos_diff"] = {
        "held_out_residual_m": round(resid, 4),
        "held_out_input_offset_m": round(off_mag, 4),
        "final_train_loss": round(hist[-1], 6),
    }
    print(f"pos_diff: residual={resid * 100:.2f}cm (input offset {off_mag * 100:.2f}cm) "
          f"[{time.time() - t0:.0f}s]", flush=True)

    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
