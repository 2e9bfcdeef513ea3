"""Benchmark harness: evaluate solved sequences against MoSh++-style GT.

Capability match for the reference's ``evaluation/comparisons.py``: for each
method, load predicted SMPL npz + GT npz + the marker c3d, run the SMPL
forward (hand joints zeroed for fairness, reference ``comparisons.py:236-237``),
compute m2s / MPJPE / PA-MPJPE / MPJVE / PA-MPJVE / V2V in mm plus per-part
variants, and aggregate mean/std/median to YAML with a per-sequence CSV
(reference ``comparisons.py:259-300``).

Method name conventions follow the reference (``comparisons.py:308``):
``moshpp`` (GT-generator re-eval), ``hmr``, ``video_mocap*`` (any config
name under ``results/``), all sharing the npz schema
{poses [F, 72+] axis-angle, betas [10+], trans [F, 3], mocap_frame_rate}.
External methods (vposer/humor/soma) are evaluated the same way from their
exported npz files when present.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.eval.metrics import compute_all_metrics, compute_part_metrics
from uuo_mocap_tpu.ops import rotations as rot


def load_smpl_npz(path: str):
    """npz {poses, betas, trans, mocap_frame_rate} -> dict of arrays."""
    data = np.load(path, allow_pickle=True)
    poses = np.asarray(data["poses"], np.float32)
    F = poses.shape[0]
    aa = poses[:, : 24 * 3].reshape(F, 24, 3)
    return {
        "pose_aa": aa,
        "betas": np.asarray(data["betas"], np.float32)[:10],
        "trans": np.asarray(data["trans"], np.float32),
        "freq": float(data["mocap_frame_rate"]) if "mocap_frame_rate" in data else 30.0,
    }


def smpl_forward_zeroed_hands(model: BodyModel, smpl: Dict[str, np.ndarray]):
    """Forward with wrist/hand joints zeroed (fairness across methods that
    don't estimate hands; reference ``comparisons.py:236-237``)."""
    aa = smpl["pose_aa"].copy()
    aa[:, 22:24] = 0.0  # zero hand joints
    F = aa.shape[0]
    mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
    betas = jnp.broadcast_to(jnp.asarray(smpl["betas"])[None], (F, 10))
    return lbs_forward(model, mats[:, 1:], betas, mats[:, :1], jnp.asarray(smpl["trans"]))


def evaluate_sequence(
    model: BodyModel,
    pred_npz: str,
    gt_npz: str,
    markers_c3d: Optional[str] = None,
) -> Dict[str, float]:
    pred = load_smpl_npz(pred_npz)
    gt = load_smpl_npz(gt_npz)
    F = min(pred["pose_aa"].shape[0], gt["pose_aa"].shape[0])
    for d in (pred, gt):
        d["pose_aa"] = d["pose_aa"][:F]
        d["trans"] = d["trans"][:F]

    out_p = smpl_forward_zeroed_hands(model, pred)
    out_g = smpl_forward_zeroed_hands(model, gt)

    if markers_c3d is not None and os.path.exists(markers_c3d):
        from uuo_mocap_tpu.data.markers import Markers

        markers = jnp.asarray(np.nan_to_num(Markers(markers_c3d).get_points()[:F], nan=0.0))
    else:
        pred_file = np.load(pred_npz, allow_pickle=True)
        if "mocap_markers" in pred_file:
            markers = jnp.asarray(np.nan_to_num(pred_file["mocap_markers"][:F], nan=0.0))
        else:
            markers = out_g["vertices"][:, ::200]  # fallback pseudo-markers

    metrics = compute_all_metrics(
        out_p["joints"][:, :24], out_g["joints"][:, :24],
        out_p["vertices"], out_g["vertices"],
        markers, model.faces, freq=gt["freq"],
    )
    parts = compute_part_metrics(out_p["joints"][:, :24], out_g["joints"][:, :24], gt["freq"])
    for part, vals in parts.items():
        for k, v in vals.items():
            metrics[f"{part}__{k}"] = v
    return metrics


def aggregate(per_sequence: Dict[str, Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    """mean/std/median per metric (reference ``comparisons.py:259-300``)."""
    if not per_sequence:
        return {}
    keys = next(iter(per_sequence.values())).keys()
    out = {}
    for k in keys:
        vals = np.asarray([m[k] for m in per_sequence.values()], np.float64)
        out[k] = {
            "mean": float(vals.mean()),
            "std": float(vals.std()),
            "median": float(np.median(vals)),
        }
    return out


def save_stats(stats: Dict, per_sequence: Dict[str, Dict[str, float]], out_dir: str, method: str):
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, method + ".yaml"), "w") as f:
        yaml.safe_dump(stats, f)
    if per_sequence:
        keys = list(next(iter(per_sequence.values())).keys())
        with open(os.path.join(out_dir, method + ".csv"), "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["sequence"] + keys)
            for seq, m in sorted(per_sequence.items()):
                writer.writerow([seq] + [f"{m[k]:.4f}" for k in keys])


def run_comparisons(
    model: BodyModel,
    input_dir: str,
    dataset: str,
    methods: List[str],
    subjects: Optional[List[str]] = None,
    gt_method: str = "smpl",
) -> Dict[str, Dict]:
    """Evaluate each method dir under ``<input_dir>/<dataset>/results/<method>``
    (or ``moshpp``/GT itself) and write ``results/stats/<dataset>/``."""
    base = os.path.join(input_dir, dataset)
    gt_dir = os.path.join(base, gt_method)
    mocap_dir = os.path.join(base, "mocap")
    stats_dir = os.path.join(base, "results", "stats", dataset)

    all_stats = {}
    for method in methods:
        method_dir = gt_dir if method == "moshpp" else os.path.join(base, "results", method)
        per_seq = {}
        subj_list = subjects or (sorted(os.listdir(method_dir)) if os.path.isdir(method_dir) else [])
        for subject in subj_list:
            sdir = os.path.join(method_dir, subject)
            if not os.path.isdir(sdir):
                continue
            for fname in sorted(os.listdir(sdir)):
                if not fname.endswith("_stageii.npz"):
                    continue
                seq = fname[: -len("_stageii.npz")]
                gt_path = os.path.join(gt_dir, subject, fname)
                if not os.path.exists(gt_path):
                    print("skip (no GT):", gt_path)
                    continue
                c3d = os.path.join(mocap_dir, subject, seq + ".c3d")
                per_seq[f"{subject}/{seq}"] = evaluate_sequence(
                    model, os.path.join(sdir, fname), gt_path, c3d if os.path.exists(c3d) else None
                )
        stats = aggregate(per_seq)
        save_stats(stats, per_seq, stats_dir, method)
        all_stats[method] = stats
        if stats:
            print(f"[{method}] mpjpe mean {stats['mpjpe']['mean']:.2f} mm, m2s mean {stats['m2s']['mean']:.2f} mm over {len(per_seq)} seqs")
    return all_stats


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--methods", nargs="+", required=True)
    parser.add_argument("--subjects", nargs="+", default=None)
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()
    run_comparisons(model, args.input_dir, args.dataset, args.methods, args.subjects)


if __name__ == "__main__":
    main()
