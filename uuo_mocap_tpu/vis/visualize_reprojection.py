"""Reprojection-stage debug overlays.

Port of the reference's ``vis/visualize_reprojection_loss.py``: for each yaw
seed, overlay the optimized projected 2D joints against the HMR targets and
plot the per-angle reprojection/chamfer metrics.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def plot_reprojection_overlays(out_dir: str, reproj_out, angles, frame: int = 0) -> list:
    """``reproj_out`` is the dict returned by ``ReprojectionStage.__call__``
    (leading angle axis)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []
    A = len(np.asarray(angles))
    for a in range(A):
        pred = np.asarray(reproj_out["joints_2d"][a][frame])
        gt = np.asarray(reproj_out["joints_2d_gt"][a][frame])
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(gt[:, 0], gt[:, 1], s=14, c="black", label="HMR 2D")
        ax.scatter(pred[:, 0], pred[:, 1], s=14, c="red", marker="x", label="projected")
        for p, g in zip(pred, gt):
            ax.plot([p[0], g[0]], [p[1], g[1]], color="gray", linewidth=0.5)
        ax.invert_yaxis()
        ax.set_title(f"angle {np.degrees(float(np.asarray(angles)[a])):.0f} deg")
        ax.legend()
        path = os.path.join(out_dir, f"reproject_angle_{a}.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        written.append(path)

    # per-angle metric bars
    fig, axes = plt.subplots(1, 2, figsize=(9, 3))
    for ax, key in zip(axes, ("reproject", "chamfer")):
        vals = np.asarray(reproj_out["metrics"][key])
        ax.bar(range(A), vals)
        ax.set_title(key)
        ax.set_xlabel("angle index")
    path = os.path.join(out_dir, "reprojection_metrics.png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    written.append(path)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run the reprojection stage on a synthetic prior and render overlays")
    parser.add_argument("--out_dir", type=str, default="render_reprojection")
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--num_angles", type=int, default=4)
    parser.add_argument("--num_iters", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.config import load_config, default_config_dir
    from uuo_mocap_tpu.data.img_smpl import ImgSmpl
    from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
    from uuo_mocap_tpu.ops.geometry import get_marker_mask
    from uuo_mocap_tpu.pipeline.reprojection import ReprojectionStage

    model = synthetic_body_model()
    cfg = load_config(os.path.join(os.path.dirname(default_config_dir()), "configs", "video_mocap.yaml"))
    cfg["stages"]["reprojection_part"]["num_iters"] = args.num_iters
    cfg["stages"]["reprojection_part"]["num_angles"] = args.num_angles

    F = args.frames
    gt = random_pose_sequence(F, seed=args.seed)
    mk = generate_markers(model, gt, num_markers=30, seed=args.seed + 1)
    prior = perturb_params(gt, seed=args.seed + 2)
    img = ImgSmpl.from_params(prior)
    # fabricate plausible camera data for the synthetic prior
    img.camera_bbox = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (F, 1))
    img.center = np.tile(np.array([320.0, 240.0], np.float32), (F, 1))
    img.scale = np.full((F, 1), 200.0, np.float32)
    img.size = np.tile(np.array([480.0, 640.0], np.float32), (F, 1))

    stage = ReprojectionStage(model, cfg, "reprojection_part")
    angles = jnp.asarray(np.arange(args.num_angles) * 2 * np.pi / args.num_angles, jnp.float32)
    out = stage(
        angles, mk.points, get_marker_mask(mk.points),
        jnp.asarray(img.pose_body), jnp.asarray(img.betas[:1]),
        jnp.asarray(img.betas), jnp.asarray(img.hmr_root_orient),
        jnp.asarray(img.trans),
        jnp.asarray(img.camera_bbox), jnp.asarray(img.center),
        jnp.asarray(img.size), jnp.asarray(img.scale),
        jnp.ones(F),
    )
    paths = plot_reprojection_overlays(args.out_dir, out, angles)
    print("wrote", *paths, sep="\n  ")


if __name__ == "__main__":
    main()
