"""Qualitative comparison renders: every method's output side by side.

Capability match for the reference's ``evaluation/qualitative.py`` (264 LoC
of per-method render loops): for each sequence, render each method's solved
body (+ the marker cloud) to
``results/qual/<method>/<subject>[/<part>|/synthetic_<s>]/<seq>.<ext>`` —
the directory layout ``vis/paper`` cropping consumes.

Methods resolve through the SAME loaders as the metrics harness
(``eval/comparisons.py:resolve_pred``): moshpp, vposer/humor(+_vid), hmr
(4D-Humans pkl -> ImgSmpl), hmr_rr, soma, video_mocap* — with --part /
--synthetic variants and gendered SMPL inference per file.
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def render_pred(
    pred: dict,
    model,
    out_path: str,
    markers: Optional[np.ndarray] = None,
    angle: float = 0.0,
    max_frames: Optional[int] = None,
    fps: float = 30.0,
) -> str:
    """Render a resolved prediction dict (comparisons schema) to a video."""
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.ops import rotations as rot
    from uuo_mocap_tpu.vis.renderer import VideoMocapRenderer
    from uuo_mocap_tpu.vis.scene import VideoMocapScene

    F = pred["trans"].shape[0]
    if max_frames:
        F = min(F, max_frames)
    mats = rot.axis_angle_to_matrix(jnp.asarray(pred["pose_aa"][:F]))
    out = lbs_forward(
        model, mats[:, 1:],
        jnp.broadcast_to(jnp.asarray(pred["betas"])[None], (F, 10)),
        mats[:, :1], jnp.asarray(pred["trans"][:F]),
    )
    verts = np.asarray(out["vertices"])

    scene = VideoMocapScene()

    def render_frame(s, f):
        s.add_mesh(verts[f], model.faces)
        if markers is not None:
            s.add_markers(markers[min(f, markers.shape[0] - 1)])

    return VideoMocapRenderer(
        scene, render_frame, F, out_path, video_fps=fps, azim=-60.0 + angle,
    ).run()


def run_qualitative(
    model,
    input_dir: str,
    dataset: str,
    methods: List[str],
    subjects: Optional[List[str]] = None,
    sequences: Optional[List[str]] = None,
    fmt: str = "gif",
    part: Optional[str] = None,
    synthetic: Optional[str] = None,
    angle: float = 0.0,
    max_frames: Optional[int] = 90,
    camera: Optional[str] = None,
    out_root: Optional[str] = None,
    body_models_dir: str = "./body_models",
) -> List[str]:
    from uuo_mocap_tpu.eval.comparisons import (
        _load_markers,
        _variant_subdir,
        default_model_provider,
        resolve_pred,
    )

    base = os.path.join(input_dir, dataset)
    gt_dir = os.path.join(base, "smpl")
    sub = _variant_subdir(part, synthetic)
    mocap_sub = (
        "mocap_parts___" + part if part else
        ("mocap_synthetic___" + synthetic if synthetic else "mocap")
    )
    mocap_dir = os.path.join(base, mocap_sub)
    out_root = out_root or os.path.join(base, "results", "qual")

    base_provider = default_model_provider(body_models_dir)

    def provider(gender):
        if model is not None and gender in (None, "", "neutral"):
            return model
        return base_provider(gender)

    # file list like the metrics harness (reference qualitative.py:66-88)
    vm_methods = [m for m in methods if m.startswith("video_mocap")]
    list_dir = os.path.join(base, "results", vm_methods[0]) if vm_methods else gt_dir
    files = []
    subj_list = subjects or (sorted(os.listdir(list_dir)) if os.path.isdir(list_dir) else [])
    for subject in subj_list:
        use_sub = sub if (vm_methods and sub) else ""
        sdir = os.path.join(list_dir, subject, use_sub) if use_sub else os.path.join(list_dir, subject)
        if not os.path.isdir(sdir):
            continue
        for fname in sorted(os.listdir(sdir)):
            if not fname.endswith("_stageii.npz"):
                continue
            seq = fname[: -len("_stageii.npz")]
            if sequences is not None and seq not in sequences:
                continue
            if os.path.exists(os.path.join(gt_dir, subject, fname)):
                files.append((subject, seq))

    written = []
    for method in methods:
        for subject, seq in files:
            pred = resolve_pred(base, method, subject, seq, camera, part, synthetic, 30.0)
            if pred is None:
                print(f"skip ({method} missing): {subject}/{seq}")
                continue
            markers = _load_markers(os.path.join(mocap_dir, subject, seq + ".c3d"), pred)
            out_dir = os.path.join(out_root, method, subject, sub) if sub else \
                os.path.join(out_root, method, subject)
            os.makedirs(out_dir, exist_ok=True)
            out = render_pred(
                pred, provider(pred.get("gender", "neutral")),
                os.path.join(out_dir, f"{seq}.{fmt}"),
                markers=markers, angle=angle, max_frames=max_frames,
            )
            written.append(out)
            print("wrote", out)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--methods", nargs="+", required=True,
                        help="moshpp vposer humor vposer_vid humor_vid hmr hmr_rr soma video_mocap*")
    parser.add_argument("--subjects", nargs="+", default=None)
    parser.add_argument("--sequences", nargs="+", default=None)
    parser.add_argument("--part", type=str, default=None)
    parser.add_argument("--synthetic", type=str, default=None)
    parser.add_argument("--angle", type=float, default=0.0)
    parser.add_argument("--extension", type=str, default="gif")
    parser.add_argument("--max_frames", type=int, default=90)
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    from uuo_mocap_tpu.cli.test import DATASET_CAMERAS

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()
    run_qualitative(
        model, args.input_dir, args.dataset, args.methods, args.subjects,
        args.sequences, args.extension.lstrip("."), args.part, args.synthetic,
        args.angle, args.max_frames, camera=DATASET_CAMERAS.get(args.dataset),
        body_models_dir=args.body_models,
    )


if __name__ == "__main__":
    main()
