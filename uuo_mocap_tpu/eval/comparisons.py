"""Benchmark harness: evaluate solved sequences against MoSh++-style GT.

Capability match for the reference's ``evaluation/comparisons.py:303-587``:
for each method, load the predicted SMPL npz (method-specific directory
conventions below), the GT npz, and the marker c3d; run the SMPL forward
with the file's own gender (reference ``comparisons.py:206-250``) and hands
zeroed for fairness (``:236-237``); compute m2s / MPJPE / PA-MPJPE / MPJVE /
PA-MPJVE / V2V in mm plus per-part variants; aggregate mean/std/median to
YAML with a per-sequence CSV (``:259-300``).

Method directory conventions (reference ``comparisons.py:330-337,399-587``):
    moshpp       <dataset>/smpl/<subject>/<seq>_stageii.npz   (GT re-eval)
    vposer|humor|vposer_vid|humor_vid
                 <dataset>/comparisons/<method>/<subject>/<seq>_stageii.npz
    hmr          <dataset>/comparisons/4d_humans/<subject>/<seq>.<camera>/
                     results/demo_<seq>.pkl  (joblib pkl -> ImgSmpl.get_smpl)
    hmr_rr       <dataset>/results/hmr/<subject>[/<part>|/synthetic_<s>]/...
    soma         <dataset>/comparisons/soma/smpl/<subject>[...]/...
    video_mocap* <dataset>/results/<method>/<subject>[...]/...

Markers come from the sequence c3d (or the npz's embedded ``mocap_markers``);
when neither exists the m2s metric is reported as NaN and excluded from the
aggregates — never fabricated.
"""
from __future__ import annotations

import csv
import os
from typing import Callable, Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.eval.metrics import compute_all_metrics, compute_part_metrics
from uuo_mocap_tpu.ops import rotations as rot

POSE_METHODS = ("vposer", "humor", "vposer_vid", "humor_vid")


def load_smpl_npz(path: str):
    """npz {poses, betas, trans, mocap_frame_rate, gender} -> dict."""
    data = np.load(path, allow_pickle=True)
    poses = np.asarray(data["poses"], np.float32)
    F = poses.shape[0]
    aa = poses[:, : 24 * 3].reshape(F, 24, 3)
    gender = str(np.asarray(data["gender"]).item()) if "gender" in data else "neutral"
    out = {
        "pose_aa": aa,
        "betas": np.asarray(data["betas"], np.float32)[:10],
        "trans": np.asarray(data["trans"], np.float32),
        "freq": float(data["mocap_frame_rate"]) if "mocap_frame_rate" in data else 30.0,
        "gender": gender,
    }
    if "mocap_markers" in data:
        out["mocap_markers"] = np.asarray(data["mocap_markers"], np.float32)
    return out


def default_model_provider(body_models_dir: str = "./body_models") -> Callable[[str], BodyModel]:
    """Gendered SMPL models cached per gender; synthetic test model when the
    (license-gated) assets are absent, matching the loader policy of
    ``cli/test.py``."""
    cache: Dict[str, BodyModel] = {}

    def provider(gender: str) -> BodyModel:
        gender = gender if gender in ("male", "female", "neutral") else "neutral"
        if gender not in cache:
            if os.path.exists(body_models_dir):
                from uuo_mocap_tpu.body.model import load_body_model

                try:
                    cache[gender] = load_body_model(body_models_dir, gender)
                except FileNotFoundError:
                    cache[gender] = load_body_model(body_models_dir, "neutral")
            else:
                from uuo_mocap_tpu.body.synthetic import synthetic_body_model

                cache[gender] = synthetic_body_model(gender)
        return cache[gender]

    return provider


def smpl_forward_zeroed_hands(model: BodyModel, smpl: Dict[str, np.ndarray]):
    """Forward with wrist/hand joints zeroed (fairness across methods that
    don't estimate hands; reference ``comparisons.py:236-237``)."""
    aa = smpl["pose_aa"].copy()
    aa[:, 22:24] = 0.0  # zero hand joints
    F = aa.shape[0]
    mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
    betas = jnp.broadcast_to(jnp.asarray(smpl["betas"])[None], (F, 10))
    return lbs_forward(model, mats[:, 1:], betas, mats[:, :1], jnp.asarray(smpl["trans"]))


def evaluate_pair(
    pred: Dict[str, np.ndarray],
    gt: Dict[str, np.ndarray],
    model_provider: Callable[[str], BodyModel],
    markers: Optional[np.ndarray],
    strict_markers: bool = False,
) -> Dict[str, float]:
    """Metrics of one (prediction, GT) pair; each runs through the SMPL of
    its own gender (reference ``smpl_inference``, ``comparisons.py:206-250``)."""
    F = min(pred["pose_aa"].shape[0], gt["pose_aa"].shape[0])
    for d in (pred, gt):
        d["pose_aa"] = d["pose_aa"][:F]
        d["trans"] = d["trans"][:F]

    model_p = model_provider(pred.get("gender", "neutral"))
    model_g = model_provider(gt.get("gender", "neutral"))
    out_p = smpl_forward_zeroed_hands(model_p, pred)
    out_g = smpl_forward_zeroed_hands(model_g, gt)

    if markers is None:
        if strict_markers:
            raise FileNotFoundError("no marker source (c3d or embedded mocap_markers)")
        # shape-correct dummy; the m2s it produces is overwritten with NaN
        markers_j = jnp.zeros((F, 1, 3), out_g["vertices"].dtype)
    else:
        markers_j = jnp.asarray(np.nan_to_num(markers[:F], nan=0.0))

    metrics = compute_all_metrics(
        out_p["joints"][:, :24], out_g["joints"][:, :24],
        out_p["vertices"], out_g["vertices"],
        markers_j, model_p.faces, freq=gt["freq"],
    )
    if markers is None:
        metrics["m2s"] = float("nan")
    parts = compute_part_metrics(out_p["joints"][:, :24], out_g["joints"][:, :24], gt["freq"])
    for part, vals in parts.items():
        for k, v in vals.items():
            metrics[f"{part}__{k}"] = v
    return metrics


def evaluate_sequence(
    model: BodyModel,
    pred_npz: str,
    gt_npz: str,
    markers_c3d: Optional[str] = None,
) -> Dict[str, float]:
    """Single-pair convenience wrapper (one fixed model for both sides)."""
    pred = load_smpl_npz(pred_npz)
    gt = load_smpl_npz(gt_npz)
    markers = _load_markers(markers_c3d, pred)
    return evaluate_pair(pred, gt, lambda g: model, markers)


def _load_markers(markers_c3d: Optional[str], pred: Dict) -> Optional[np.ndarray]:
    if markers_c3d is not None and os.path.exists(markers_c3d):
        from uuo_mocap_tpu.data.markers import Markers

        return Markers(markers_c3d).get_points()
    if "mocap_markers" in pred:
        return pred["mocap_markers"]
    return None


def aggregate(per_sequence: Dict[str, Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    """mean/std/median per metric, NaN entries excluded (reference
    ``comparisons.py:259-300``)."""
    if not per_sequence:
        return {}
    keys = next(iter(per_sequence.values())).keys()
    out = {}
    for k in keys:
        vals = np.asarray([m[k] for m in per_sequence.values()], np.float64)
        vals = vals[np.isfinite(vals)]
        if vals.size == 0:
            continue
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


def _variant_subdir(part: Optional[str], synthetic: Optional[str]) -> str:
    if part is not None:
        return part
    if synthetic is not None:
        return "synthetic_" + synthetic
    return ""


def resolve_pred(
    base: str,
    method: str,
    subject: str,
    seq: str,
    camera: Optional[str],
    part: Optional[str],
    synthetic: Optional[str],
    mocap_freq: float,
) -> Optional[Dict]:
    """Load one method's prediction for (subject, seq) following the
    reference's per-method path conventions; None when absent."""
    sub = _variant_subdir(part, synthetic)

    def npz_at(root):
        path = os.path.join(root, subject, sub, seq + "_stageii.npz") if sub else \
            os.path.join(root, subject, seq + "_stageii.npz")
        return load_smpl_npz(path) if os.path.exists(path) else None

    if method == "moshpp":
        # GT loads flat — the part/synthetic variants never fork the GT dir
        # (reference comparisons.py:378)
        path = os.path.join(base, "smpl", subject, seq + "_stageii.npz")
        return load_smpl_npz(path) if os.path.exists(path) else None
    if method in POSE_METHODS:
        # vposer/humor live flat under comparisons/<method> (no variant dirs,
        # reference comparisons.py:401-410)
        path = os.path.join(base, "comparisons", method, subject, seq + "_stageii.npz")
        return load_smpl_npz(path) if os.path.exists(path) else None
    if method == "hmr":
        # 4D-Humans demo pkl -> ImgSmpl -> SMPL export (reference :440-447)
        video_seq = seq + ("." + camera if camera else "")
        path = os.path.join(
            base, "comparisons", "4d_humans", subject, video_seq, "results", "demo_" + seq + ".pkl"
        )
        if not os.path.exists(path):
            return None
        import joblib

        from uuo_mocap_tpu.data.img_smpl import ImgSmpl

        smpl = ImgSmpl(joblib.load(path), mocap_freq).get_smpl()
        F = smpl["poses"].shape[0]
        return {
            "pose_aa": smpl["poses"][:, : 24 * 3].reshape(F, 24, 3).astype(np.float32),
            "betas": np.asarray(smpl["betas"], np.float32)[:10],
            "trans": np.asarray(smpl["trans"], np.float32),
            "freq": mocap_freq,
            "gender": str(np.asarray(smpl["gender"]).item()),
        }
    if method == "hmr_rr":
        return npz_at(os.path.join(base, "results", "hmr"))
    if method == "soma":
        return npz_at(os.path.join(base, "comparisons", "soma", "smpl"))
    if method.startswith("video_mocap"):
        return npz_at(os.path.join(base, "results", method))
    raise ValueError(f"unknown method {method!r}")


def run_comparisons(
    model: BodyModel,
    input_dir: str,
    dataset: str,
    methods: List[str],
    subjects: Optional[List[str]] = None,
    camera: Optional[str] = None,
    part: Optional[str] = None,
    synthetic: Optional[str] = None,
    body_models_dir: str = "./body_models",
    output_root: Optional[str] = None,
    mocap_freq: float = 30.0,
) -> Dict[str, Dict]:
    """Evaluate every requested method (reference ``comparisons.py:303-587``).

    The sequence list comes from the first ``video_mocap*`` method's results
    dir when present (reference :341-358), else from the GT dir; sequences
    without GT are skipped.  Writes ``results/stats/<dataset>[/<variant>]/``.
    """
    base = os.path.join(input_dir, dataset)
    gt_dir = os.path.join(base, "smpl")
    sub = _variant_subdir(part, synthetic)
    mocap_sub = (
        "mocap_parts___" + part if part else
        ("mocap_synthetic___" + synthetic if synthetic else "mocap")
    )
    mocap_dir = os.path.join(base, mocap_sub)
    stats_dir = output_root or os.path.join(base, "results", "stats", dataset)
    if sub:
        stats_dir = os.path.join(stats_dir, sub)

    base_provider = default_model_provider(body_models_dir)

    def provider(gender: str) -> BodyModel:
        # the explicitly passed model serves neutral files; male/female load
        # through the gendered provider (reference smpl_inference creates the
        # model from each file's own gender, comparisons.py:206-250)
        if model is not None and gender in (None, "", "neutral"):
            return model
        return base_provider(gender)

    # ---- the file list (reference :341-358)
    vm_methods = [m for m in methods if m.startswith("video_mocap")]
    if vm_methods:
        list_dir = os.path.join(base, "results", vm_methods[0])
    else:
        list_dir = gt_dir
    files = []
    subj_list = subjects or (sorted(os.listdir(list_dir)) if os.path.isdir(list_dir) else [])
    for subject in subj_list:
        # variant subdirs exist under method results dirs, not under the GT dir
        use_sub = sub if (vm_methods and sub) else ""
        sdir = os.path.join(list_dir, subject, use_sub) if use_sub else os.path.join(list_dir, subject)
        if not os.path.isdir(sdir):
            continue
        for fname in sorted(os.listdir(sdir)):
            if not fname.endswith("_stageii.npz"):
                continue
            seq = fname[: -len("_stageii.npz")]
            if os.path.exists(os.path.join(gt_dir, subject, fname)):
                files.append((subject, seq))

    all_stats = {}
    for method in methods:
        per_seq = {}
        for subject, seq in files:
            gt_path = os.path.join(gt_dir, subject, seq + "_stageii.npz")
            pred = resolve_pred(base, method, subject, seq, camera, part, synthetic, mocap_freq)
            if pred is None:
                print(f"skip ({method} missing): {subject}/{seq}")
                continue
            gt = load_smpl_npz(gt_path)
            markers = _load_markers(os.path.join(mocap_dir, subject, seq + ".c3d"), pred)
            if markers is None:
                print(f"warn: no markers for {subject}/{seq}; m2s reported as NaN")
            per_seq[f"{subject}/{seq}"] = evaluate_pair(pred, gt, provider, markers)
        stats = aggregate(per_seq)
        save_stats(stats, per_seq, stats_dir, method)
        all_stats[method] = stats
        if stats:
            m2s = stats.get("m2s", {}).get("mean", float("nan"))
            print(
                f"[{method}] mpjpe mean {stats['mpjpe']['mean']:.2f} mm, "
                f"m2s mean {m2s:.2f} mm over {len(per_seq)} seqs"
            )
    return all_stats


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--methods", nargs="+", required=True,
                        help="moshpp vposer humor vposer_vid humor_vid hmr hmr_rr soma video_mocap*")
    parser.add_argument("--subjects", nargs="+", default=None)
    parser.add_argument("--part", type=str, default=None)
    parser.add_argument("--synthetic", type=str, default=None)
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    from uuo_mocap_tpu.cli.test import DATASET_CAMERAS

    provider = default_model_provider(args.body_models)
    run_comparisons(
        provider("neutral"), args.input_dir, args.dataset, args.methods, args.subjects,
        camera=DATASET_CAMERAS.get(args.dataset), part=args.part, synthetic=args.synthetic,
        body_models_dir=args.body_models,
    )


if __name__ == "__main__":
    main()
