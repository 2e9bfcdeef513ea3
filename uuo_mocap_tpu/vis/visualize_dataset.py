"""AMASS / procedural dataset viewer + synthetic-marker viewer.

Ports of the reference's ``vis/visualize_dataset.py`` and
``vis/visualize_synthetic_markers.py``: render a dataset sample's body and
its generated virtual markers.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--amass_dir", type=str, default=None)
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--num_markers", type=int, default=41)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--structured", action="store_true", help="cmu_41 layout markers")
    parser.add_argument("--video", type=str, default=None)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.amass import DatasetMocap
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    body = synthetic_body_model()
    ds = DatasetMocap(body, amass_dir=args.amass_dir, sequence_length=args.frames,
                      num_markers=args.num_markers)
    params = ds._load_params(args.index)
    if args.structured:
        from uuo_mocap_tpu.data.markers_synthetic import MarkersSyntheticStructured

        mk = MarkersSyntheticStructured(body, num_frames=args.frames, seed=args.index)
        markers, labels = mk.get_points(), np.asarray(mk.marker_labels)
        params = mk.gt_params
    else:
        sample = ds.compute_markers(params)
        markers, labels = sample["markers"], sample["marker_labels"]

    F = params.trans.shape[0]
    out = lbs_forward(body, params.pose_body, jnp.broadcast_to(params.betas, (F, 10)),
                      params.root_orient, params.trans)
    verts = np.asarray(out["vertices"])
    F = min(F, markers.shape[0])

    scene = VideoMocapScene()

    def render_frame(s, frame):
        s.add_mesh(verts[frame], body.faces)
        s.add_markers(markers[frame], labels=labels)

    path = VideoMocapRenderer(scene, render_frame, F, args.video).run()
    print("wrote", path)


if __name__ == "__main__":
    main()
