"""Per-segment iteration journal + gif replay (the reference's iter_fn /
--save_iterations protocol, ``multimodal.py:102-142``; VERDICT r1 item 5)."""
import glob
import os

import numpy as np
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.data.config import load_config
from uuo_mocap_tpu.data.img_smpl import ImgSmpl
from uuo_mocap_tpu.data.markers import ArrayMarkers
from uuo_mocap_tpu.data.synthetic import generate_markers, perturb_params, random_pose_sequence
from uuo_mocap_tpu.pipeline.journal import IterationJournal
from uuo_mocap_tpu.pipeline.multimodal import multimodal_video_mocap

pytestmark = pytest.mark.slow  # full-solve e2e tier (see pyproject)


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_segment_snapshots_and_gif_replay(body, tmp_path):
    cfg = load_config("configs/video_mocap.yaml")
    cfg["num_root_orient_angles"] = 1
    cfg["find_best_part_fits"] = False
    # >1 segment (SEGMENT_SIZE=50) so the journal records WITHIN-stage
    # parameter evolution, not just stage endpoints
    cfg["stages"]["chamfer"]["num_iters"] = 120
    cfg["stages"]["marker"]["num_iters"] = 120

    gt = random_pose_sequence(12, seed=5)
    mk = generate_markers(body, gt, num_markers=14, seed=6)
    prior = perturb_params(gt, seed=7, pose_noise=0.03)

    journal = IterationJournal()
    multimodal_video_mocap(
        ImgSmpl.from_params(prior), ArrayMarkers(np.asarray(mk.points)),
        cfg, body, frame_bucket=None, iter_journal=journal,
    )
    path = journal.save(str(tmp_path / "journal.pkl"))

    seg_counts = {k: len(v) for k, v in journal.entries.items() if k.endswith("__segments")}
    assert "chamfer__segments" in seg_counts and "marker__segments" in seg_counts
    assert any(n >= 2 for n in seg_counts.values()), seg_counts
    # snapshots carry render-ready per-lane parameters
    entry = journal.entries["chamfer__segments"][0]
    assert set(entry["params"]) >= {"trans", "betas", "pose_body", "root_orient"}
    assert entry["params"]["pose_body"].shape[-3:] == (23, 3, 3)
    assert entry["lanes"].shape == entry["iters"].shape

    # replay to per-stage gifs
    from uuo_mocap_tpu.vis.visualize_iterations import main as replay

    out_dir = str(tmp_path / "replay")
    replay(["--journal", path, "--out_dir", out_dir, "--gif",
            "--body_models", "/nonexistent"])
    gifs = glob.glob(os.path.join(out_dir, "replay_*.gif"))
    assert gifs, "no replay gif written"
