"""Run the full solver on one sequence and render the result — the demo CLI.

Port of the reference's main demo entry ``vis/visualize_model.py:28-429``:
flags for marker corruption (swap / tracking loss / drop / shuffle), part
culling, per-iteration journal dump, and side-by-side rendering of markers +
solved SMPL + (optionally) the HMR prior body.

Usage:
    python -m uuo_mocap_tpu.vis.visualize_model --config configs/video_mocap.yaml \
        --dataset <ds> --input_dir <dir> --subject s1 --sequence seq \
        [--video out.mp4] [--marker_swap P] [--marker_tracking_loss P] ...
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--subject", required=True)
    parser.add_argument("--sequence", required=True)
    parser.add_argument("--camera", type=str, default=None)
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--viewer", action="store_true",
                        help="open the interactive viewer (pyrender/matplotlib) "
                             "instead of writing files; headless falls back")
    parser.add_argument("--body_models", type=str, default="./body_models")
    parser.add_argument("--show_hmr", action="store_true", help="render the HMR prior body too")
    parser.add_argument("--marker_swap", type=float, default=0.0)
    parser.add_argument("--marker_tracking_loss", type=float, default=0.0)
    parser.add_argument("--marker_drop", type=int, default=0)
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--cull_parts", nargs="+", type=int, default=None)
    parser.add_argument("--save_iterations", type=str, default=None, help="journal pkl path")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import joblib

    from uuo_mocap_tpu.cli.test import DATASET_CAMERAS, _video_freq
    from uuo_mocap_tpu.data.config import load_config
    from uuo_mocap_tpu.data.img_smpl import ImgSmpl
    from uuo_mocap_tpu.data.markers import Markers
    from uuo_mocap_tpu.data.markers_noise import (
        markers_swap,
        markers_tracking_loss,
        randomly_drop_markers,
    )
    from uuo_mocap_tpu.pipeline.journal import IterationJournal
    from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap
    from uuo_mocap_tpu.pipeline.segmentation import shuffle_markers, trim_trailing_zero_frames
    from uuo_mocap_tpu.utils.mesh import cull_parts
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()

    config = load_config(args.config)
    camera = args.camera or DATASET_CAMERAS.get(args.dataset)
    base = os.path.join(args.input_dir, args.dataset)
    seq_video = args.sequence + ("." + camera if camera else "")

    markers = Markers(os.path.join(base, "mocap", args.subject, args.sequence + ".c3d"))
    pts = np.nan_to_num(markers.get_points(), nan=0.0)
    pts = trim_trailing_zero_frames(pts)
    rng = np.random.RandomState(args.seed)
    if args.shuffle:
        pts = shuffle_markers(pts, rng)
    if args.marker_swap > 0:
        pts = markers_swap(pts, swap_probability=args.marker_swap, rng=rng)
    if args.marker_tracking_loss > 0:
        pts = markers_tracking_loss(pts, probability=args.marker_tracking_loss, rng=rng)
    if args.marker_drop > 0:
        pts = randomly_drop_markers(pts, markers.get_frequency(), num_drop=args.marker_drop, rng=rng)
    markers.set_points(pts)

    pkl = os.path.join(base, "comparisons", "4d_humans", args.subject, seq_video, "results",
                       "demo_" + args.sequence + ".pkl")
    video_file = os.path.join(base, "videos", args.subject, seq_video + ".avi")
    img_smpl = ImgSmpl(joblib.load(pkl), _video_freq(video_file))

    journal = IterationJournal() if args.save_iterations else None
    result = multimodal_video_mocap(
        img_smpl, markers, config, model, offset=0,
        print_options=["progress"], save_stages=True, iter_journal=journal,
    )
    if journal is not None:
        journal.save(args.save_iterations)
        print("journal ->", args.save_iterations)

    # render solved body + markers (+ HMR prior)
    from uuo_mocap_tpu.body.model import lbs_forward

    F = result["trans"].shape[0]
    out = lbs_forward(
        model,
        jnp.asarray(result["pose_body"]),
        jnp.asarray(result["betas"]),
        jnp.asarray(result["root_orient"]),
        jnp.asarray(result["trans"]),
    )
    verts = np.asarray(out["vertices"])

    faces = model.faces
    if args.cull_parts:
        labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
        faces = cull_parts(faces, labels, args.cull_parts)

    hmr_verts = None
    if args.show_hmr:
        hmr_out = lbs_forward(
            model,
            jnp.asarray(img_smpl.pose_body[:F]),
            jnp.asarray(np.broadcast_to(img_smpl.betas[:1], (F, 10))),
            jnp.asarray(img_smpl.root_orient[:F]),
            jnp.asarray(img_smpl.trans[:F]),
        )
        hmr_verts = np.asarray(hmr_out["vertices"])

    labels_m = result["markers_labels"]
    scene = VideoMocapScene()

    def render_frame(s, frame):
        s.add_mesh(verts[frame], faces)
        if hmr_verts is not None:
            s.add_mesh(hmr_verts[frame], model.faces, color=(0.9, 0.7, 0.4), name="hmr")
        s.add_markers(pts[frame], labels=labels_m[min(frame, labels_m.shape[0] - 1)])

    path = VideoMocapRenderer(
        scene, render_frame, F, args.video, markers.get_frequency()
    ).run(interactive=args.viewer)
    print("wrote", path)


if __name__ == "__main__":
    main()
