"""Replay a saved solve journal: per-stage parameter snapshots -> renders.

Port of the reference's ``vis/visualize_iterations.py`` (pkl replay of
``--save_iterations`` dumps): renders each recorded stage's body next to the
markers and plots per-stage metrics (hypothesis scores, timings).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--journal", required=True, help="pkl from --save_iterations")
    parser.add_argument("--markers", type=str, default=None, help=".c3d for context")
    parser.add_argument("--out_dir", type=str, default="render_iterations")
    parser.add_argument("--frame", type=int, default=0, help="frame to render per stage")
    parser.add_argument("--lane", type=int, default=0,
                        help="hypothesis lane to follow through __segments entries")
    parser.add_argument("--gif", action="store_true",
                        help="assemble per-stage replay gifs from the segment snapshots")
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.pipeline.journal import IterationJournal
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()

    entries = IterationJournal.load(args.journal)
    os.makedirs(args.out_dir, exist_ok=True)

    markers = None
    if args.markers:
        from uuo_mocap_tpu.data.markers import Markers

        markers = np.nan_to_num(Markers(args.markers).get_points(), nan=0.0)

    timeline = []
    for stage, records in entries.items():
        for ri, rec in enumerate(records):
            timeline.append((rec.get("t", 0.0), stage, ri, rec))
    timeline.sort()

    stage_pngs = {}
    for t, stage, ri, rec in timeline:
        params = rec.get("params")
        if params is None:
            continue
        if "lanes" in rec:  # per-segment snapshot: pick the requested lane
            lanes = np.asarray(rec["lanes"])
            pos = np.where(lanes == args.lane)[0]
            if pos.size == 0:
                continue  # lane already retired (converged) this segment
            params = {k: np.asarray(v)[int(pos[0])] for k, v in params.items()}
        pose = jnp.asarray(params["pose_body"])
        F = pose.shape[0]
        out = lbs_forward(
            model, pose,
            jnp.broadcast_to(jnp.asarray(params["betas"]), (F, 10)),
            jnp.asarray(params["root_orient"]), jnp.asarray(params["trans"]),
        )
        verts = np.asarray(out["vertices"])
        frame = min(args.frame, F - 1)

        scene = VideoMocapScene()

        def render_frame(s, _f, verts=verts, frame=frame):
            s.add_mesh(verts[frame], model.faces)
            if markers is not None:
                s.add_markers(markers[min(frame, markers.shape[0] - 1)])

        path = os.path.join(args.out_dir, f"{t:08.2f}_{stage}_{ri}.png")
        VideoMocapRenderer(scene, render_frame, 1, None).run()
        os.replace(os.path.join(os.getcwd(), "render_preview.png"), path)
        stage_pngs.setdefault(stage, []).append(path)
        print("wrote", path)

    if args.gif:
        # assemble the within-stage evolution into replay gifs (the
        # reference's visualize_iterations replays per-iteration dumps;
        # ours replays per-segment snapshots)
        from PIL import Image

        for stage, paths in stage_pngs.items():
            if len(paths) < 2:
                continue
            frames = [Image.open(p) for p in paths]
            gif_path = os.path.join(args.out_dir, f"replay_{stage}.gif")
            frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                           duration=350, loop=0)
            print("wrote", gif_path)

    # hypothesis-score plot if recorded
    for stage, records in entries.items():
        for rec in records:
            if "scores" in rec:
                fig, ax = plt.subplots()
                ax.bar(range(len(rec["scores"])), rec["scores"])
                ax.set_xlabel("yaw hypothesis")
                ax.set_ylabel("chamfer score")
                fig.savefig(os.path.join(args.out_dir, f"scores_{stage}.png"))
                plt.close(fig)


if __name__ == "__main__":
    main()
