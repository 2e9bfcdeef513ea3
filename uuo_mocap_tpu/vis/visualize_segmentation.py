"""Run the neural part segmenter on synthetic markers and render predicted
part colors (+ confusion matrix).

Port of the reference's ``vis/visualize_segmentation_multimodal.py`` — which
imports a training module the reference never shipped; here the training
loop exists (``models/train.py``), so this CLI can train-or-load and then
visualize.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoints", type=str, default="./checkpoints")
    parser.add_argument("--multimodal", action="store_true")
    parser.add_argument("--train_steps", type=int, default=200, help="train if no checkpoint")
    parser.add_argument("--num_markers", type=int, default=41)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--confusion", type=str, default=None, help="confusion matrix png")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.synthetic import random_pose_sequence
    from uuo_mocap_tpu.models import train as T
    from uuo_mocap_tpu.models.checkpoints import checkpoint_path, load_params, save_params
    from uuo_mocap_tpu.models.marker_segmenter import MarkerSegmenter
    from uuo_mocap_tpu.models.marker_segmenter_multimodal import MarkerSegmenterMultimodal
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene
    from uuo_mocap_tpu.vis.plots import plot_confusion_matrix

    body = synthetic_body_model()
    name = "marker_segmenter_multimodal" if args.multimodal else "marker_segmenter"
    model = MarkerSegmenterMultimodal() if args.multimodal else MarkerSegmenter()

    # train-or-load
    if os.path.exists(checkpoint_path(args.checkpoints, name)):
        pts0, _, jts0 = T._segmentation_batch(body, 1, args.num_markers, seed=9999)
        template = (
            model.init(jax.random.PRNGKey(0), pts0, jts0)
            if args.multimodal
            else model.init(jax.random.PRNGKey(0), pts0)
        )
        params = load_params(template, args.checkpoints, name)
    else:
        train_fn = T.train_marker_segmenter_multimodal if args.multimodal else T.train_marker_segmenter
        params, hist = train_fn(body, steps=args.train_steps, num_markers=args.num_markers)
        save_params(params, args.checkpoints, name)
        print(f"trained {name}: loss {hist[0]:.3f} -> {hist[-1]:.3f}")

    # synthetic sequence + predictions
    gt = random_pose_sequence(args.frames, seed=args.seed)
    F = args.frames
    out = lbs_forward(body, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
    rng = np.random.RandomState(args.seed)
    vid = rng.choice(body.num_vertices, args.num_markers, replace=False)
    markers = np.asarray(out["vertices"][:, vid])
    true_labels = np.asarray(jnp.argmax(body.lbs_weights, axis=-1))[vid]

    if args.multimodal:
        probs = model.forward_sequence(params, jnp.asarray(markers), out["joints"][:, :22])
    else:
        probs = model.forward_sequence(params, jnp.asarray(markers))
    pred = np.asarray(jnp.argmax(probs, axis=-1))  # [F, M]

    acc = float((pred == true_labels[None]).mean())
    print(f"per-marker part accuracy: {acc:.3f}")

    if args.confusion:
        plot_confusion_matrix(args.confusion, np.tile(true_labels, (F, 1)), pred)
        print("wrote", args.confusion)

    scene = VideoMocapScene()

    def render_frame(s, frame):
        s.add_markers(markers[frame], labels=pred[frame])

    path = VideoMocapRenderer(scene, render_frame, F, args.video).run()
    print("wrote", path)


if __name__ == "__main__":
    main()
