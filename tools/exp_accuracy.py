"""Accuracy diagnostic: per-stage MPJPE decomposition on the bench workload.

Runs the bench batch (same seeds/shapes as bench.py) through the production
batched sweep with ``save_stages=True`` and prints, per sequence and per
stage (part seed -> chamfer -> marker -> refinement):
  * MPJPE (mm) against the generating parameters,
  * MPJPE with solved betas REPLACED by ground-truth betas (shape error's
    contribution), and
  * betas L2 error.

Env knobs (same as bench.py): UUO_BENCH_BATCH, UUO_BENCH_LANE_WIDTH,
UUO_BENCH_RANK_PER_ITER, UUO_BENCH_PRUNE[, _ITERS, _KEEP].
Usage: python tools/exp_accuracy.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # bench.py at the repo root: workload + config protocol


def main():
    import jax
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward
    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.config import load_config
    from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver

    model = synthetic_body_model()
    cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "video_mocap.yaml"))
    cfg["parallel"] = {"lane_width": bench.LANE_WIDTH, "part_lane_width": 16, "pad_width": True}
    if os.environ.get("UUO_BENCH_RANK_PER_ITER") == "1":
        cfg["optimizer"]["rank_per_iteration"] = True
    if os.environ.get("UUO_BENCH_PRUNE") == "1":
        ai = [int(x) for x in os.environ.get("UUO_BENCH_PRUNE_ITERS", "150").split(",")]
        kp = [int(x) for x in os.environ.get("UUO_BENCH_PRUNE_KEEP", "1").split(",")]
        cfg["parallel"]["hypothesis_prune"] = {
            "enabled": True,
            "at_iters": ai[0] if len(ai) == 1 else ai,
            "keep": kp[0] if len(kp) == 1 else kp,
            "rank_phase1": os.environ.get("UUO_BENCH_RANK_PHASE1") == "1",
        }
    if os.environ.get("UUO_EXP_STAGE_REPEATS"):
        cfg["stage_repeats"] = int(os.environ["UUO_EXP_STAGE_REPEATS"])
    solver = MultiSequenceSolver(model, cfg)

    gts, preps = bench.make_batch(model, seed0=int(os.environ.get("UUO_EXP_SEED0", "2000")))
    os.makedirs(bench.CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", bench.CACHE_DIR)
    # cache EVERY compile: the warmup profile showed 309 sub-1s "tiny" program
    # compiles (helper gathers/scatters, conversions) costing ~0.5 s EACH over
    # the tunneled backend — 149 s/process that a 1.0 s threshold excluded
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    t0 = time.time()
    out = solver.solve_prepared(preps, save_stages=True,
                                print_options=["progress"])
    dt = time.time() - t0
    print(f"solve: {dt:.1f}s  evals={out['lbfgs_evals']}")
    print(f"stage_times_s: {out['stage_times_s']}")

    joints = bench._joints_fn(model)

    def mpjpe(gt, pose, betas, root, trans):
        F = gt.trans.shape[0]
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            j_gt = joints(gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)),
                          gt.root_orient, gt.trans)
            j_s = joints(jnp.asarray(pose), jnp.broadcast_to(jnp.asarray(betas), (F, 10)),
                         jnp.asarray(root), jnp.asarray(trans))
            return float(jnp.mean(jnp.linalg.norm(j_s - j_gt, axis=-1))) * 1e3

    dump = os.environ.get("UUO_EXP_DUMP")
    if dump:
        flat = {}
        for q, (gt, r) in enumerate(zip(gts, out["results"])):
            for k in ("pose_body", "betas", "root_orient", "trans"):
                flat[f"s{q}_{k}"] = np.asarray(r[k])
                flat[f"g{q}_{k}"] = np.asarray(getattr(gt, k))
        np.savez(dump, n=len(gts), **flat)
        print(f"dumped solved/gt params -> {dump}")

    for q, (gt, r) in enumerate(zip(gts, out["results"])):
        print(f"--- seq {q} (best hypothesis {r['best_hypothesis']})")
        rows = list(r.get("stages", {}).items()) + [("final", r)]
        for name, sd in rows:
            e = mpjpe(gt, sd["pose_body"], sd["betas"], sd["root_orient"], sd["trans"])
            e_gtb = mpjpe(gt, sd["pose_body"], np.asarray(gt.betas), sd["root_orient"], sd["trans"])
            be = float(np.linalg.norm(np.asarray(sd["betas"]).reshape(-1, 10)[0]
                                      - np.asarray(gt.betas).reshape(-1)))
            print(f"  {name:14s} mpjpe {e:7.1f} mm   gt-betas {e_gtb:7.1f} mm   |dbetas| {be:.3f}")


if __name__ == "__main__":
    main()
