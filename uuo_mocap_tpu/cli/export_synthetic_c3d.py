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
            seed += 1


if __name__ == "__main__":
    main()
