"""Raw marker-cloud viewer with corruption experiments.

CLI port of the reference's ``vis/visualize_markers.py:16-46``: renders a
c3d marker cloud, optionally after drop / shuffle / re-ID / rigid-cluster
coloring experiments.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help=".c3d file")
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--id_markers", action="store_true", help="re-identify after shuffle")
    parser.add_argument("--drop", type=int, default=0, help="number of markers to drop")
    parser.add_argument("--rigid_colors", action="store_true", help="color rigid clusters")
    parser.add_argument("--max_frames", type=int, default=300)
    args = parser.parse_args(argv)

    from uuo_mocap_tpu.data.markers import Markers
    from uuo_mocap_tpu.data.markers_noise import randomly_drop_markers
    from uuo_mocap_tpu.pipeline.segmentation import id_markers, segment_rigid, shuffle_markers
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    mk = Markers(args.input)
    points = np.nan_to_num(mk.get_points(), nan=0.0)[: args.max_frames]
    if args.shuffle:
        points = shuffle_markers(points, np.random.RandomState(0))
    if args.id_markers:
        points = id_markers(points)
    if args.drop:
        points = randomly_drop_markers(points, mk.get_frequency(), num_drop=args.drop)

    labels = None
    if args.rigid_colors:
        groups = segment_rigid(points)
        labels = np.zeros(points.shape[1], np.int64)
        for gi, g in enumerate(groups):
            labels[g] = gi

    scene = VideoMocapScene()

    def render_frame(s, frame):
        s.add_markers(points[frame], labels=labels)

    out = VideoMocapRenderer(scene, render_frame, points.shape[0], args.video, mk.get_frequency()).run()
    print("wrote", out)


if __name__ == "__main__":
    main()
