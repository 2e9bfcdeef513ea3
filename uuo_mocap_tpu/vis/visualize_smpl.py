"""Render saved SMPL npz (+ optional c3d markers) to video.

CLI port of the reference's ``vis/visualize_smpl.py:16-127`` (multi-subject
npz renderer).

Usage:
    python -m uuo_mocap_tpu.vis.visualize_smpl --input_files a_stageii.npz \
        [--markers seq.c3d] --video out.mp4
"""
from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np


def visualize_smpl(
    input_files: List[str],
    model,
    markers_file: Optional[str] = None,
    video_path: Optional[str] = None,
    fps: Optional[float] = None,
    part_colors: bool = False,
    up_axis: str = "z",
):
    import jax.numpy as jnp

    from uuo_mocap_tpu.eval.comparisons import load_smpl_npz, smpl_forward_zeroed_hands
    from uuo_mocap_tpu.utils.colors import colors_for_labels
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    bodies = []
    for path in input_files:
        smpl = load_smpl_npz(path)
        out = smpl_forward_zeroed_hands(model, smpl)
        bodies.append(np.asarray(out["vertices"]))
    F = min(b.shape[0] for b in bodies)
    freq = fps or load_smpl_npz(input_files[0])["freq"]

    markers = None
    if markers_file:
        from uuo_mocap_tpu.data.markers import Markers

        markers = np.nan_to_num(Markers(markers_file).get_points()[:F], nan=0.0)

    vertex_colors = None
    if part_colors:
        labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
        vertex_colors = colors_for_labels(labels)

    scene = VideoMocapScene(up_axis=up_axis)

    def render_frame(s: VideoMocapScene, frame: int):
        for b in bodies:
            s.add_mesh(b[frame], model.faces, vertex_colors=vertex_colors)
        if markers is not None:
            s.add_markers(markers[frame])

    renderer = VideoMocapRenderer(scene, render_frame, F, video_path, video_fps=freq)
    return renderer.run()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_files", nargs="+", required=True)
    parser.add_argument("--markers", type=str, default=None)
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--fps", type=float, default=None)
    parser.add_argument("--part_colors", action="store_true")
    parser.add_argument("--up_axis", type=str, default="z", choices=("x", "y", "z"))
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    import os

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()
    out = visualize_smpl(args.input_files, model, args.markers, args.video, args.fps,
                         args.part_colors, args.up_axis)
    print("wrote", out)


if __name__ == "__main__":
    main()
