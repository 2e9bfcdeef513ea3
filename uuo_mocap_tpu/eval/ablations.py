"""Stage ablations: re-evaluate saved per-stage solver outputs.

Capability match for the reference's ``evaluation/ablations.py:75-137``:
the batch CLI exports ``*_stageii.<stage>.npz`` for stages
{part, root, chamfer, marker, marker_final}; this harness scores each stage
snapshot with the full metric suite, quantifying what every stage
contributes — without re-solving.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

from uuo_mocap_tpu.body.model import BodyModel
from uuo_mocap_tpu.eval.comparisons import aggregate, evaluate_sequence, save_stats

STAGES = ["part", "root", "chamfer", "marker", "marker_final"]


def run_stage_ablations(
    model: BodyModel,
    input_dir: str,
    dataset: str,
    method: str,
    subjects: Optional[List[str]] = None,
    stages: List[str] = STAGES,
    gt_method: str = "smpl",
) -> Dict[str, Dict]:
    base = os.path.join(input_dir, dataset)
    method_dir = os.path.join(base, "results", method)
    gt_dir = os.path.join(base, gt_method)
    mocap_dir = os.path.join(base, "mocap")
    stats_dir = os.path.join(base, "results", "stats", dataset)

    all_stats = {}
    for stage in stages:
        per_seq = {}
        subj_list = subjects or (sorted(os.listdir(method_dir)) if os.path.isdir(method_dir) else [])
        for subject in subj_list:
            sdir = os.path.join(method_dir, subject)
            if not os.path.isdir(sdir):
                continue
            suffix = f"_stageii.{stage}.npz"
            for fname in sorted(os.listdir(sdir)):
                if not fname.endswith(suffix):
                    continue
                seq = fname[: -len(suffix)]
                gt_path = os.path.join(gt_dir, subject, seq + "_stageii.npz")
                if not os.path.exists(gt_path):
                    continue
                c3d = os.path.join(mocap_dir, subject, seq + ".c3d")
                per_seq[f"{subject}/{seq}"] = evaluate_sequence(
                    model, os.path.join(sdir, fname), gt_path,
                    c3d if os.path.exists(c3d) else None,
                )
        if per_seq:
            stats = aggregate(per_seq)
            save_stats(stats, per_seq, stats_dir, f"{method}.{stage}")
            all_stats[stage] = stats
            print(f"[{method}.{stage}] mpjpe {stats['mpjpe']['mean']:.2f} mm over {len(per_seq)} seqs")
    return all_stats


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--method", required=True)
    parser.add_argument("--subjects", nargs="+", default=None)
    parser.add_argument("--stages", nargs="+", default=STAGES)
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()
    run_stage_ablations(model, args.input_dir, args.dataset, args.method, args.subjects, args.stages)


if __name__ == "__main__":
    main()
