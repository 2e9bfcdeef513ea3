"""Does the full L-BFGS chamfer segment program survive at width W?

Builds the production chamfer stage program at the canonical shapes
(F=450, M=41) and runs ONE device segment (abort_after_segments=1).
Usage: python probe_width.py <W>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 24
os.environ["UUO_BENCH_BATCH"] = str(W // 4)
os.environ["UUO_BENCH_LANE_WIDTH"] = str(W)

import jax

import bench  # noqa: E402

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.parallel.batch_solver import MultiSequenceSolver

model = synthetic_body_model()
cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "video_mocap.yaml"))
cfg["parallel"] = {"lane_width": W, "part_lane_width": 64, "pad_width": True}
cfg["find_best_part_fits"] = False  # go straight to the chamfer stage
solver = MultiSequenceSolver(model, cfg)

gts, preps = bench.make_batch(model, seed0=1000, easy=True)
jax.config.update("jax_compilation_cache_dir", bench.CACHE_DIR)
# cache EVERY compile: the warmup profile showed 309 sub-1s "tiny" program
# compiles (helper gathers/scatters, conversions) costing ~0.5 s EACH over
# the tunneled backend — 149 s/process that a 1.0 s threshold excluded
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

for s in (solver.stages._chamfer_solver, solver.stages._marker_solver):
    s.abort_after_segments = 1
t0 = time.time()
out = solver.solve_prepared(preps)
print(f"W={W}: chamfer+marker segment OK in {time.time()-t0:.1f}s — NO CRASH")
