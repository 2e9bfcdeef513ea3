"""Qualitative comparison renders: every method's output side by side.

Capability match for the reference's ``evaluation/qualitative.py``: for each
sequence, render each method's solved body (+ markers) to
``results/qual/<dataset>/<subject>/<seq>/<method>.<ext>``.
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional


def run_qualitative(
    model,
    input_dir: str,
    dataset: str,
    methods: List[str],
    subjects: Optional[List[str]] = None,
    fmt: str = "gif",
    max_frames: int = 90,
) -> List[str]:
    from uuo_mocap_tpu.vis.visualize_smpl import visualize_smpl

    base = os.path.join(input_dir, dataset)
    mocap_dir = os.path.join(base, "mocap")
    out_root = os.path.join(base, "results", "qual", dataset)

    written = []
    for method in methods:
        method_dir = os.path.join(base, "smpl") if method == "moshpp" else os.path.join(base, "results", method)
        if not os.path.isdir(method_dir):
            print("skip method (no dir):", method_dir)
            continue
        subj_list = subjects or sorted(os.listdir(method_dir))
        for subject in subj_list:
            sdir = os.path.join(method_dir, subject)
            if not os.path.isdir(sdir):
                continue
            for fname in sorted(os.listdir(sdir)):
                if not fname.endswith("_stageii.npz"):
                    continue
                seq = fname[: -len("_stageii.npz")]
                out_dir = os.path.join(out_root, subject, seq)
                os.makedirs(out_dir, exist_ok=True)
                c3d = os.path.join(mocap_dir, subject, seq + ".c3d")
                out = visualize_smpl(
                    [os.path.join(sdir, fname)], model,
                    markers_file=c3d if os.path.exists(c3d) else None,
                    video_path=os.path.join(out_dir, f"{method}.{fmt}"),
                )
                written.append(out)
                print("wrote", out)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--methods", nargs="+", required=True)
    parser.add_argument("--subjects", nargs="+", default=None)
    parser.add_argument("--format", type=str, default="gif")
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()
    run_qualitative(model, args.input_dir, args.dataset, args.methods, args.subjects, args.format)


if __name__ == "__main__":
    main()
