"""Experiment: network segmentation mode vs cluster mode, end to end.

VERDICT r4 item 4's second half: wired-and-tested is not demonstrated-at-
quality.  This tool solves the SAME synthetic workload twice through the
production batched sweep — once with the default rigid-cluster segmentation
(reference ``markers_utils.py:244-271``) and once with the shipped neural
segmenter checkpoint (``part.mode: network``, reference
``markers_utils.py:34-76``) — and reports per-sequence MPJPE for both.

Success criterion (VERDICT): network mode within ~2 mm of cluster mode on
the same sequences, or a documented counter-result.

Usage: python tools/exp_network_mode.py [--batch 4] [--frames 150]
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
    ap.add_argument("--frames", type=int, default=150)
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
    for mode in ("cluster", "network"):
        cfg = load_config(os.path.join(root, "configs", "video_mocap.yaml"))
        cfg["parallel"] = {
            "lane_width": 16, "part_lane_width": 16, "pad_width": True,
            # shipped bench defaults (accuracy-parity measured, Benchmarks.md r3/r4)
            "hypothesis_prune": {"enabled": True, "at_iters": [50, 150], "keep": [2, 1]},
            "part_prune": {"enabled": True, "at_iters": 15, "keep": 2},
        }
        cfg["stages"]["part"]["mode"] = mode
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

    delta = out["network"]["mpjpe_mm_mean"] - out["cluster"]["mpjpe_mm_mean"]
    out["delta_mm_network_minus_cluster"] = round(delta, 2)
    out["within_2mm"] = bool(abs(delta) <= 2.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
