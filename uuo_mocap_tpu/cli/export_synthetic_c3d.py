"""Generate synthetic unstructured-marker c3d benchmarks from SMPL GT.

CLI port of the reference's ``tools/export_synthetic_c3d.py:12-75``: writes
``<input_dir>/<dataset>/mocap_synthetic___<seed>_<M>/<subject>/<seq>.c3d``
plus the ground-truth ``*_stageii.npz`` used by the comparison harness.
GT motion comes from existing GT npz files when present, else the
procedural generator.

Usage:
    python -m uuo_mocap_tpu.cli.export_synthetic_c3d --input_dir ./data \
        --dataset synthetic_demo --subjects s1 --sequences walk_000 \
        --num_markers 41 --seed 0
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--subjects", nargs="+", default=["s1"])
    parser.add_argument("--sequences", nargs="+", default=["seq_000"])
    parser.add_argument("--num_markers", type=int, default=41)
    parser.add_argument("--num_frames", type=int, default=450)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--freq", type=float, default=30.0)
    parser.add_argument("--structured", action="store_true", help="use the cmu_41 layout")
    parser.add_argument("--layout", type=str, default="cmu_41")
    parser.add_argument("--parts", nargs="+", default=None, help="limb subset for structured export")
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument(
        "--prior", choices=["perturbed", "gt", "none"], default="perturbed",
        help="also write a 4D-Humans-style demo pkl so cli.test runs the "
             "synthetic closed loop without video assets (the reference "
             "skips sequences lacking the pkl, test/test.py:91-93)")
    parser.add_argument("--prior_pose_noise", type=float, default=0.05)
    parser.add_argument("--prior_trans_noise", type=float, default=0.08)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.c3d import write_c3d
    from uuo_mocap_tpu.data.markers_synthetic import MarkersSynthetic, MarkersSyntheticStructured
    from uuo_mocap_tpu.ops import rotations as rot

    model = synthetic_body_model()
    if args.structured and args.parts:
        tag = "parts"
        mocap_dirname = "mocap_parts___" + "_".join(args.parts)
    else:
        tag = f"{args.seed}_{args.num_markers}"
        mocap_dirname = f"mocap_synthetic___{tag}"

    base = os.path.join(args.input_dir, args.dataset)
    seed = args.seed
    for subject in args.subjects:
        for seq in args.sequences:
            if args.structured:
                mk = MarkersSyntheticStructured(
                    model, layout=args.layout, num_frames=args.num_frames,
                    seed=seed, freq=args.freq, parts=args.parts, shuffle=args.shuffle,
                )
            else:
                mk = MarkersSynthetic(
                    model, num_frames=args.num_frames, num_markers=args.num_markers,
                    seed=seed, freq=args.freq, shuffle=args.shuffle,
                )
            out_dir = os.path.join(base, mocap_dirname, subject)
            os.makedirs(out_dir, exist_ok=True)
            write_c3d(os.path.join(out_dir, seq + ".c3d"), mk.get_points(), rate=args.freq, units="m")

            # ground-truth npz in the MoSh++ GT schema (for evaluation)
            gt = mk.gt_params
            F = gt.trans.shape[0]
            poses_mat = jnp.concatenate([gt.root_orient, gt.pose_body], axis=1)
            poses_aa = np.asarray(rot.matrix_to_axis_angle(poses_mat)).reshape(F, -1)
            gt_dir = os.path.join(base, "smpl", subject)
            os.makedirs(gt_dir, exist_ok=True)
            np.savez(
                os.path.join(gt_dir, seq + "_stageii.npz"),
                poses=poses_aa,
                betas=np.asarray(gt.betas)[0],
                trans=np.asarray(gt.trans),
                mocap_frame_rate=args.freq,
                gender="neutral",
            )
            print(f"wrote {out_dir}/{seq}.c3d ({mk.get_num_markers()} markers, {len(mk)} frames)")

            if args.prior != "none":
                _write_prior_pkl(base, subject, seq, model, gt, args, seed)
            seed += 1


def _write_prior_pkl(base, subject, seq, model, gt, args, seed):
    """Write a PHALP/4D-Humans demo pkl (the schema ``ImgSmpl`` parses,
    ``data/img_smpl.py:55-100``) from the GT — perturbed by default, the
    same prior protocol as the closed-loop tests/bench.  Camera streams are
    left empty (reprojection stages are off in the shipped config)."""
    import joblib

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.data.img_smpl import CORRECTION_MATRIX
    from uuo_mocap_tpu.data.synthetic import perturb_params
    from uuo_mocap_tpu.utils.foot_contact import JOINTS_2D

    import jax.numpy as jnp

    prior = gt if args.prior == "gt" else perturb_params(
        gt, seed=seed + 77, pose_noise=args.prior_pose_noise,
        trans_noise=args.prior_trans_noise)
    F = prior.trans.shape[0]
    joints = np.asarray(lbs_forward(
        model, jnp.asarray(prior.pose_body),
        jnp.broadcast_to(jnp.asarray(prior.betas), (F, 10)),
        jnp.asarray(prior.root_orient), jnp.asarray(prior.trans))["joints"])
    C_inv = CORRECTION_MATRIX.T  # orthogonal; parser applies C @ global_orient
    betas = np.broadcast_to(np.asarray(prior.betas), (F, 10))
    data = {}
    for f in range(F):
        j3d = np.asarray(joints[f, :45], np.float32).copy()
        j3d[JOINTS_2D["pelvis_low"]] = joints[f, 0]  # parser reads trans here
        data[f"frame_{f:06d}.jpg"] = {
            "tracked_ids": [0],
            "smpl": [{
                "global_orient": (C_inv @ np.asarray(prior.root_orient[f, 0], np.float32)),
                "body_pose": np.asarray(prior.pose_body[f], np.float32),
                "betas": np.asarray(betas[f], np.float32),
            }],
            "3d_joints": [j3d],
            "2d_joints": [np.zeros(90, np.float32)],
            "camera_bbox": [],
            "center": [],
            "scale": [],
            "size": [],
        }
    pkl_dir = os.path.join(base, "comparisons", "4d_humans", subject, seq, "results")
    os.makedirs(pkl_dir, exist_ok=True)
    path = os.path.join(pkl_dir, "demo_" + seq + ".pkl")
    joblib.dump(data, path)
    print(f"wrote {path} ({args.prior} prior)")


if __name__ == "__main__":
    main()
