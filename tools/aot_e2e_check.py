"""Drive the production batched solve with AOT ON and report export health.

Usage: UUO_AOT=1 python tools/aot_e2e_check.py [n_runs]

Run 1 (cold AOT dir) exports every stage program; run it twice and compare
the second process's wall clock + hit counts — the second should skip all
tracing/lowering.  Prints per-cache stats and any fallback reasons; a clean
production state is zero fallbacks.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("UUO_AOT", "1")
os.environ.setdefault("UUO_AOT_DIR", "/tmp/aot_e2e_check")

import numpy as np  # noqa: E402

t_import = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uuo_mocap_tpu.body.synthetic import synthetic_body_model  # noqa: E402
from uuo_mocap_tpu.data.config import load_config  # noqa: E402
from uuo_mocap_tpu.data.img_smpl import ImgSmpl  # noqa: E402
from uuo_mocap_tpu.data.markers import ArrayMarkers  # noqa: E402
from uuo_mocap_tpu.data.synthetic import (  # noqa: E402
    generate_markers, perturb_params, random_pose_sequence,
)
from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver  # noqa: E402
from uuo_mocap_tpu.pipeline.multimodal import prepare_sequence  # noqa: E402
from uuo_mocap_tpu.solver import aot as aot_mod  # noqa: E402


def main():
    body = synthetic_body_model()
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 2
    cfg["stages"]["part"]["num_iters"] = 5
    cfg["stages"]["chamfer"]["num_iters"] = 5
    cfg["stages"]["marker"]["num_iters"] = 5

    Q, F, M = 2, 16, 12
    preps = []
    for q in range(Q):
        gt = random_pose_sequence(F, seed=70 + q)
        mk = generate_markers(body, gt, num_markers=M, seed=80 + q)
        prior = perturb_params(gt, seed=90 + q, pose_noise=0.02)
        preps.append(prepare_sequence(
            ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)),
            frame_bucket=None,
        ))

    solver = MultiSequenceSolver(body, cfg)
    t0 = time.time()
    out = solver.solve_prepared(preps)
    dt = time.time() - t0
    assert out["lbfgs_evals"] > 0
    for r in out["results"]:
        assert np.isfinite(np.asarray(r["trans"])).all()

    caches = {"stages": solver.stages._aot, "part_fit": solver.part_fitter._aot}
    print(f"solve_s={dt:.1f} total_s={time.time() - t_import:.1f} evals={out['lbfgs_evals']}")
    for name, c in caches.items():
        print(f"{name}: {c.stats}")
    if aot_mod.FALLBACKS:
        print("FALLBACKS:")
        for n, r in aot_mod.FALLBACKS:
            print(f"  {n}: {r[:300]}")
        sys.exit(1)
    print("no fallbacks")


if __name__ == "__main__":
    main()
