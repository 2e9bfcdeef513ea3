"""Batch solve + SMPL export CLI — flag-compatible with the reference's
``test/test.py`` (``test/test.py:150-241``).

Dataset layout (identical to the reference):
    <input_dir>/<dataset>/mocap[ _parts___P | _synthetic___S ]/<subject>/<seq>.c3d
    <input_dir>/<dataset>/videos/<subject>/<seq>[.<camera>].avi
    <input_dir>/<dataset>/comparisons/4d_humans/<subject>/<videoseq>/results/demo_<seq>.pkl
Outputs:
    <input_dir>/<dataset>/results/<config name>/<subject>/<seq>_stageii.npz
    + per-stage ``..._stageii.<stage>.npz`` files (resume: existing outputs
    are skipped).

Usage:
    python -m uuo_mocap_tpu.cli.test --config configs/video_mocap.yaml \
        --dataset cmu_kitchen_pilot_rb --input_dir ./data \
        --sequences brownies_00000150 --subjects s1
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

DATASET_CAMERAS = {
    "umpm": "l",
    "cmu_kitchen_pilot": "7151062",
    "cmu_kitchen_pilot_rb": "7151062",
    "moyo_train": None,
    "moyo_val": None,
    "bmlmovi_train": None,
    "bmlmovi_val": None,
}


def _video_freq(path: str, default: float = 30.0) -> float:
    try:
        import cv2

        video = cv2.VideoCapture(path)
        freq = video.get(cv2.CAP_PROP_FPS)
        return float(freq) if freq and freq > 0 else default
    except Exception:
        return default


def export_stageii(output_filename: str, result: Dict, stage: Optional[str] = None) -> str:
    """Write the ``*_stageii.npz`` schema (reference ``test/test.py:114-143``):
    poses = axis-angle cat(root, body) [F, 72], betas [10], trans [F, 3],
    mocap_frame_rate, mocap_markers, gender."""
    import jax.numpy as jnp

    from uuo_mocap_tpu.ops import rotations as rot

    if stage is None:
        root = result["root_orient"]
        pose = result["pose_body"]
        trans = result["trans"]
        betas = result["betas"][0]
    else:
        sdict = result["stages"][stage]
        root, pose, trans, betas = (
            sdict["root_orient"], sdict["pose_body"], sdict["trans"], sdict["betas"],
        )

    poses_mat = np.concatenate([root, pose], axis=1)  # [F, 24, 3, 3]
    poses_aa = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(poses_mat)))
    out = {
        "betas": betas,
        "trans": trans,
        "poses": poses_aa.reshape(poses_aa.shape[0], -1),
        "mocap_frame_rate": result["mocap_frame_rate"],
        "mocap_markers": result["mocap_markers"].get_points(),
        "gender": "neutral",
    }
    fname = output_filename if stage is None else output_filename.replace("_stageii", f"_stageii.{stage}")
    np.savez(fname, **out)
    return fname


def bucket_work_by_shape(work: List[Dict], frame_bucket: int = 64,
                         marker_bucket: int = 8) -> List[Dict]:
    """Stable-sort the work list by (frame-bucket, marker-bucket) read from
    each c3d's 512-byte header, so batches group shape-compatible sequences
    and a 3 s MOYO window never pads to a neighboring 15 s CMU window
    (VERDICT r2 item 7).  Directory order is preserved within a bucket, and
    unreadable files sort last (they fail with a real error at load time).
    """
    from uuo_mocap_tpu.data.c3d import peek_c3d_shape

    def key(item):
        try:
            F0, M0 = peek_c3d_shape(item["markers_file"])
        except (OSError, ValueError):
            return (1 << 30, 1 << 30)
        return (-(-F0 // frame_bucket), -(-M0 // marker_bucket))

    return sorted(work, key=key)


def run_test(
    input_dir: str,
    output_dir: str,
    dataset: str,
    camera: Optional[str],
    config: Dict,
    model,
    part: Optional[str] = None,
    synthetic: Optional[str] = None,
    sequences: Optional[List[str]] = None,
    subjects: Optional[List[str]] = None,
    num_files: Optional[int] = None,
    print_options: List[str] = [],
    save_iterations: Optional[str] = None,
    batch: int = 1,
) -> int:
    import joblib

    from uuo_mocap_tpu.data.img_smpl import ImgSmpl
    from uuo_mocap_tpu.data.markers import ArrayMarkers, Markers
    from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap
    from uuo_mocap_tpu.pipeline.segmentation import trim_trailing_zero_frames

    if part:
        mocap_dir = os.path.join(input_dir, dataset, "mocap_parts___" + part)
    elif synthetic:
        mocap_dir = os.path.join(input_dir, dataset, "mocap_synthetic___" + synthetic)
    else:
        mocap_dir = os.path.join(input_dir, dataset, "mocap")
    video_dir = os.path.join(input_dir, dataset, "videos")
    comparisons_dir = os.path.join(input_dir, dataset, "comparisons", "4d_humans")

    if subjects is None:
        subjects = sorted(os.listdir(mocap_dir))

    # ---- build the filtered work list FIRST (sequences/subjects filters,
    # output-exists resume skip, missing-pkl skip), so the prefetcher only
    # parses files that will actually be solved — enqueueing everything up
    # front leaks parsed arrays in the C++ ready map on resume/filtered runs
    work: List[Dict] = []
    for subject in subjects:
        if sequences is None:
            seqs = sorted(os.listdir(os.path.join(mocap_dir, subject)))
        else:
            seqs = [s + ".c3d" for s in sequences]
        seqs = [s for s in seqs if s.endswith(".c3d")]

        for seq in seqs:
            seq_name = seq[: -len(".c3d")]
            video_seq_name = seq_name + ("." + camera if camera else "")

            if synthetic:
                out_file = os.path.join(output_dir, subject, "synthetic_" + synthetic, seq_name + "_stageii")
            else:
                out_file = os.path.join(output_dir, subject, seq_name + "_stageii")
            os.makedirs(os.path.dirname(out_file), exist_ok=True)
            if os.path.exists(out_file + ".npz"):
                print("Skipping", out_file)
                continue

            markers_file = os.path.join(mocap_dir, subject, seq)
            video_file = os.path.join(video_dir, subject, video_seq_name + ".avi")
            pkl_file = os.path.join(comparisons_dir, subject, video_seq_name, "results", "demo_" + seq_name + ".pkl")
            if not os.path.isfile(pkl_file):
                print("Skipping", pkl_file)
                continue
            work.append(dict(
                subject=subject, seq_name=seq_name, out_file=out_file,
                markers_file=markers_file, video_file=video_file, pkl_file=pkl_file,
            ))
    if num_files is not None:
        work = work[: num_files + 1]  # the loop solves num_files+1 then returns

    if batch > 1:
        work = bucket_work_by_shape(work, frame_bucket=64, marker_bucket=8)

    # Native thread-pool prefetcher: upcoming c3d files parse while the TPU
    # solves the current sequence (the reference's loop is fully sequential).
    from uuo_mocap_tpu.data.c3d_native import SequencePrefetcher

    prefetcher = SequencePrefetcher(n_threads=2)
    pending: List[str] = []
    for item in work:
        prefetcher.enqueue(item["markers_file"])
        pending.append(item["markers_file"])

    def load_markers(markers_file):
        if markers_file in pending:
            data = prefetcher.get(markers_file)
            from uuo_mocap_tpu.data.markers import _UNIT_SCALE

            markers = Markers.__new__(Markers)
            ArrayMarkers.__init__(
                markers,
                data["points"][:, :, :3] / _UNIT_SCALE.get(data.get("units", "m"), 1.0),
                freq=data["rate"],
                labels=data.get("labels", []),
            )
            markers.filename = markers_file
        else:
            markers = Markers(markers_file)
        pts = np.nan_to_num(markers.get_points(), nan=0.0)
        pts = trim_trailing_zero_frames(pts)
        markers.set_points(pts)
        return markers

    def export_result(item, result):
        export_stageii(item["out_file"] + ".npz", result)
        for stage in result.get("stages", {}):
            export_stageii(item["out_file"] + ".npz", result, stage)

    if batch > 1:
        # ---- the production sharded sweep: groups of `batch` sequences
        # solve as lanes of single batched device programs
        # (parallel/batch_solver.py; the reference's loop is sequential,
        # test/test.py:50-147)
        from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver
        from uuo_mocap_tpu.pipeline.multimodal import prepare_sequence

        if save_iterations:
            print(
                "[warn] --save_iterations is not supported with --batch > 1 "
                "(the lane-batched sweep keeps no per-sequence iteration "
                "journal); run without --batch to record iterations"
            )
        solver = MultiSequenceSolver(model, config)
        file_count = 0
        for g0 in range(0, len(work), batch):
            group = work[g0 : g0 + batch]
            loaded = []
            for item in group:
                img_smpl = ImgSmpl(joblib.load(item["pkl_file"]), _video_freq(item["video_file"]))
                loaded.append((item, img_smpl, load_markers(item["markers_file"])))
            # shared padded shape for the group (bucket-of-64 frames)
            raw_preps = [prepare_sequence(ims, mk, offset=0) for _, ims, mk in loaded]
            F_pad = max(p.F for p in raw_preps)
            M_pad = max(p.markers.shape[1] for p in raw_preps)
            preps = [
                prepare_sequence(ims, mk, offset=0, pad_to_frames=F_pad, pad_to_markers=M_pad)
                for _, ims, mk in loaded
            ]
            out = solver.solve_prepared(preps, print_options=print_options, save_stages=True)
            for (item, _, mk), result in zip(loaded, out["results"]):
                result = dict(result)
                result["mocap_markers"] = mk
                export_result(item, result)
                print(f"Solved {item['subject']}/{item['seq_name']} (batch of {len(group)})")
                file_count += 1
            print(
                f"Batch of {len(group)}: {out['solve_time_s']:.1f}s total, "
                f"{out['lbfgs_evals']} evals, stages {out['stage_times_s']}"
            )
            if num_files is not None and file_count > num_files:
                return file_count
        return file_count

    file_count = 0
    for item in work:
            subject, seq_name = item["subject"], item["seq_name"]

            img_smpl = ImgSmpl(joblib.load(item["pkl_file"]), _video_freq(item["video_file"]))
            markers = load_markers(item["markers_file"])

            journal = None
            if save_iterations:
                from uuo_mocap_tpu.pipeline.journal import IterationJournal

                journal = IterationJournal()
            result = multimodal_video_mocap(
                img_smpl, markers, config, model, offset=0,
                print_options=print_options, save_stages=True, iter_journal=journal,
            )
            if journal is not None:
                os.makedirs(save_iterations, exist_ok=True)
                journal.save(os.path.join(save_iterations, f"{subject}_{seq_name}_iterations.pkl"))
            export_result(item, result)
            print(f"Solved {subject}/{seq_name} in {result['solve_time_s']:.1f}s")

            file_count += 1
            if num_files is not None and file_count > num_files:
                return file_count
    return file_count


def main(argv=None):
    parser = argparse.ArgumentParser(description="uuo_mocap_tpu batch solver")
    parser.add_argument("--config", type=str, required=True, help="configuration file")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--body_models", type=str, default="./body_models",
                        help="SMPL asset dir; synthetic test model if missing")
    parser.add_argument("--cpu_only", action="store_true")
    parser.add_argument("--gpu", type=int, default=None, help="accepted for reference parity (ignored; XLA picks the device)")
    parser.add_argument("--num_files", type=int, default=None)
    parser.add_argument("--sequences", nargs="+", type=str, default=None)
    parser.add_argument("--subjects", nargs="+", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_list", nargs="+", default=[])
    parser.add_argument("--parts", action="store_true")
    parser.add_argument("--parts_list", nargs="+", default=[])
    parser.add_argument("--print_options", type=str, nargs="*", default=["loss", "progress"])
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax profiler trace (TensorBoard format) to this dir")
    parser.add_argument("--save_iterations", type=str, default=None,
                        help="write the per-stage iteration journal pkl here")
    parser.add_argument("--batch", type=int, default=1,
                        help="solve this many sequences as one batched sweep "
                             "(lanes of single device programs; 1 = sequential)")
    args = parser.parse_args(argv)

    if args.cpu_only:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from uuo_mocap_tpu.body.model import load_body_model
    from uuo_mocap_tpu.data.config import load_config

    config = load_config(args.config)
    output_dir = os.path.join(args.input_dir, args.dataset, "results", config["name"])
    camera = DATASET_CAMERAS.get(args.dataset)

    if os.path.exists(args.body_models):
        model = load_body_model(args.body_models, "neutral")
    else:
        print(f"[warn] {args.body_models} not found; using the synthetic test body model")
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model("neutral")

    common = dict(
        input_dir=args.input_dir, output_dir=output_dir, dataset=args.dataset,
        camera=camera, config=config, model=model, sequences=args.sequences,
        subjects=args.subjects, num_files=args.num_files, print_options=args.print_options,
        save_iterations=args.save_iterations, batch=args.batch,
    )

    profiler_ctx = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profiler_ctx = args.profile

    base = os.path.join(args.input_dir, args.dataset)
    if args.parts:
        dirs = [d for d in os.listdir(base) if d.startswith("mocap_parts")]
        if args.parts_list:
            dirs = [d for d in dirs if d.split("mocap_parts___")[-1] in args.parts_list]
        for d in dirs:
            run_test(part=d.split("___")[-1], **common)
    elif args.synthetic:
        dirs = [d for d in os.listdir(base) if d.startswith("mocap_synthetic")]
        if args.synthetic_list:
            dirs = [d for d in dirs if d.split("mocap_synthetic___")[-1] in args.synthetic_list]
        for d in dirs:
            run_test(synthetic=d.split("___")[-1], **common)
    else:
        run_test(**common)

    if profiler_ctx:
        import jax

        jax.profiler.stop_trace()
        print("profiler trace ->", profiler_ctx)


if __name__ == "__main__":
    main()
