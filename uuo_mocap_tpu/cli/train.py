"""Train the neural model family and write checkpoints.

The reference loads pretrained ``.pth`` checkpoints but never shipped
training code (SURVEY.md §2.3); this CLI trains every model on synthetic
data from the body model (AMASS npz directories plug in via --amass_dir)
and writes flax checkpoints under ``--checkpoints`` in the layout the
pipeline loads (``marker_segmenter/final/model.msgpack`` etc.).

Usage:
    python -m uuo_mocap_tpu.cli.train --models marker_segmenter pos2bc \
        --steps 500 --checkpoints ./checkpoints
"""
from __future__ import annotations

import argparse

MODELS = (
    "marker_segmenter",
    "marker_segmenter_multimodal",
    "pos2bc",
    "pos_diff",
    "motion_embedding",
    "foot_contact",
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=list(MODELS), choices=list(MODELS))
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--num_markers", type=int, default=41)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoints", type=str, default="./checkpoints")
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    import os

    from uuo_mocap_tpu.models import train as T
    from uuo_mocap_tpu.models.checkpoints import save_params

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        body = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        body = synthetic_body_model()

    for name in args.models:
        print(f"=== training {name} ({args.steps} steps) ===", flush=True)
        if name == "marker_segmenter":
            params, hist = T.train_marker_segmenter(
                body, steps=args.steps, batch=args.batch, num_markers=args.num_markers,
                lr=args.lr, seed=args.seed,
            )
            save_params(params, args.checkpoints, name)
        elif name == "marker_segmenter_multimodal":
            params, hist = T.train_marker_segmenter_multimodal(
                body, steps=args.steps, batch=args.batch, num_markers=args.num_markers,
                lr=args.lr, seed=args.seed,
            )
            save_params(params, args.checkpoints, name)
        elif name == "pos2bc":
            params, hist = T.train_pos2bc(body, steps=args.steps, lr=args.lr, seed=args.seed)
            save_params(params, args.checkpoints, "barycentric_coords/pos2bc")
        elif name == "pos_diff":
            params, hist = T.train_pos_diff(body, steps=args.steps, lr=args.lr, seed=args.seed)
            save_params(params, args.checkpoints, "barycentric_coords/pos_diff")
        elif name == "motion_embedding":
            (m_params, j_params), hist = T.train_motion_embedding(
                body, steps=args.steps, batch=args.batch, lr=args.lr, seed=args.seed
            )
            save_params(m_params, args.checkpoints, "motion_embedding/markers")
            save_params(j_params, args.checkpoints, "motion_embedding/joints")
        elif name == "foot_contact":
            params, hist = T.train_foot_contact(body, steps=args.steps, batch=args.batch,
                                                lr=args.lr, seed=args.seed)
            save_params(params, args.checkpoints, "foot_contact")
        print(f"  loss {hist[0]:.4f} -> {hist[-1]:.4f}")


if __name__ == "__main__":
    main()
