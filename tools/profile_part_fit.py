"""Profile the part_fit stage's wall-clock on the official bench workload.

VERDICT r3 item 2: part_fit took 20.45 s (38% of the solve) for only 240
device evals (~1-2 s of descent at 4.3 ms/eval) — the other ~18 s was
unaccounted.  This tool runs ONLY the part-fit stage of the bench batch
(chamfer/marker/refine iters zeroed) with UUO_PROFILE_PART_FIT=1 so
``PartFitter.fit_batch`` syncs at every phase boundary and reports the
exact breakdown: descend (prune + final), tournament scoring passes,
survivor gathers, relabel, host assembly.

Usage (real TPU, same env knobs as bench.py):
    python tools/profile_part_fit.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["UUO_PROFILE_PART_FIT"] = "1"

import numpy as np

import bench  # reuse the official workload + cache/config plumbing


def main():
    os.makedirs(bench.CACHE_DIR, exist_ok=True)
    bench._tpu_watchdog()
    import jax

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.config import load_config
    from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver

    model = synthetic_body_model()
    cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "video_mocap.yaml"))
    cfg["parallel"] = {"lane_width": bench.LANE_WIDTH, "part_lane_width": 16,
                       "pad_width": True}
    pai = [int(x) for x in os.environ.get("UUO_BENCH_PART_PRUNE_ITERS", "15").split(",")]
    pkp = [int(x) for x in os.environ.get("UUO_BENCH_PART_PRUNE_KEEP", "2").split(",")]
    if os.environ.get("UUO_BENCH_PART_PRUNE", "1") == "1":
        cfg["parallel"]["part_prune"] = {
            "enabled": True,
            "at_iters": pai[0] if len(pai) == 1 else pai,
            "keep": pkp[0] if len(pkp) == 1 else pkp,
        }
    # part fit ONLY: later stages zeroed (the stage schedule skips them)
    cfg["num_root_orient_angles"] = 1
    for st in ("chamfer", "marker"):
        cfg["stages"][st]["num_iters"] = 0
    cfg["stage_repeats"] = 0

    solver = MultiSequenceSolver(model, cfg)

    gts_w, preps_w = bench.make_batch(model, seed0=1000, easy=True)
    gts, preps = bench.make_batch(model, seed0=2000)
    jax.config.update("jax_compilation_cache_dir", bench.CACHE_DIR)
    # cache EVERY compile: the warmup profile showed 309 sub-1s "tiny" program
    # compiles (helper gathers/scatters, conversions) costing ~0.5 s EACH over
    # the tunneled backend — 149 s/process that a 1.0 s threshold excluded
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # compile-only warmup
    t_w = time.time()
    solver.part_fitter._solver.abort_after_segments = 1
    solver.solve_prepared(preps_w)
    solver.part_fitter._solver.abort_after_segments = None
    warmup_s = time.time() - t_w

    t0 = time.time()
    out = solver.solve_prepared(preps)
    dt = time.time() - t0

    phases = {k: round(v, 2) for k, v in solver.part_fitter.last_phase_times.items()}
    report = {
        "warmup_s": round(warmup_s, 1),
        "stage_times_s": out["stage_times_s"],
        "part_fit_phases_s": phases,
        "part_fit_phase_sum_s": round(sum(phases.values()), 2),
        "solve_time_s": round(dt, 2),
        "eval_stats": out["eval_stats"],
        "lbfgs_evals": int(out["lbfgs_evals"]),
        "prune": cfg["parallel"].get("part_prune"),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
