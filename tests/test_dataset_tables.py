"""Vendored dataset tables drive the preprocess CLIs end-to-end
(reference preprocess_cmu_kitchen/umpm/moyo; VERDICT r1 item 6)."""
import os

import numpy as np

from uuo_mocap_tpu.cli.preprocess_datasets import run_dataset
from uuo_mocap_tpu.data.c3d import read_c3d, write_c3d
from uuo_mocap_tpu.data.dataset_tables import (
    CMU_KITCHEN_BACKPACK_LABELS,
    CMU_KITCHEN_BODY_PARTS,
    MOYO_VALID_MARKERS,
    UMPM_PARTS_BODY_PARTS,
    umpm_fix_label,
)


def _make_c3d(path, labels, frames=90, rate=30.0, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(frames, len(labels), 3).astype(np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_c3d(path, pts, rate=rate, units="m", labels=labels)
    return pts


def test_cmu_backpack_and_parts(tmp_path):
    labels = ["s1:" + n for n in (
        CMU_KITCHEN_BACKPACK_LABELS[:3]
        + CMU_KITCHEN_BODY_PARTS["right_arm"][:4]
        + CMU_KITCHEN_BODY_PARTS["left_shoulder"][:3]
        + ["LFHD", "RFHD"]
    )]
    raw = tmp_path / "raw"
    _make_c3d(str(raw / "s1" / "brownies.c3d"), labels)
    out = tmp_path / "data"
    run_dataset("cmu_kitchen", str(raw), str(out), subjects=["s1"],
                remove_backpack=True, parts=["right_arm"], window_seconds=1.0)
    ds = out / "cmu_kitchen_pilot_rb"
    full = sorted((ds / "mocap" / "s1").glob("*.c3d"))
    assert full, "no windowed c3d written"
    data = read_c3d(str(full[0]))
    # backpack markers removed by exact vendored label
    assert not any(l in CMU_KITCHEN_BACKPACK_LABELS for l in data["labels"])
    # subject prefix stripped
    assert all(not l.startswith("s1") for l in data["labels"])
    part = sorted((ds / "mocap_parts___right_arm" / "s1").glob("*.c3d"))
    assert part
    pdata = read_c3d(str(part[0]))
    assert set(pdata["labels"]) <= set(CMU_KITCHEN_BODY_PARTS["right_arm"])
    assert len(pdata["labels"]) == 4


def test_umpm_fix_label_and_parts(tmp_path):
    # raw UMPM labels: lowercase + the dataset's LKNSSBK typo
    raw_names = ["lknssbk", "lankfr", "lankbk", "lankis", "fhead", "rhead", "lhead"]
    labels = ["p1:" + n for n in raw_names]
    raw = tmp_path / "raw"
    _make_c3d(str(raw / "p1" / "take1.c3d"), labels)
    out = tmp_path / "data"
    run_dataset("umpm_parts", str(raw), str(out), subjects=["p1"],
                parts=["left_ankle", "head"], window_seconds=1.0)
    ds = out / "umpm"
    data = read_c3d(str(sorted((ds / "mocap" / "p1").glob("*.c3d"))[0]))
    assert "UMPM_LKNEEBK" in data["labels"]  # typo fixed + namespaced
    ankle = read_c3d(str(sorted((ds / "mocap_parts___left_ankle" / "p1").glob("*.c3d"))[0]))
    assert set(ankle["labels"]) == set(UMPM_PARTS_BODY_PARTS["left_ankle"])
    head = read_c3d(str(sorted((ds / "mocap_parts___head" / "p1").glob("*.c3d"))[0]))
    assert set(head["labels"]) == set(UMPM_PARTS_BODY_PARTS["head"])


def test_moyo_session_whitelist(tmp_path):
    session = "20221004_with_com"
    valid = MOYO_VALID_MARKERS[session][:6]
    labels = valid + ["BROKEN1", "BROKEN2"]
    raw = tmp_path / "raw"
    _make_c3d(str(raw / session / "yoga1.c3d"), labels, frames=180)
    out = tmp_path / "data"
    run_dataset("moyo", str(raw), str(out), subjects=[session])
    ds = out / "moyo"
    data = read_c3d(str(sorted((ds / "mocap" / session).glob("*.c3d"))[0]))
    assert set(data["labels"]) == set(valid)  # only whitelisted markers kept
    # window length is the MOYO default 3 s @ 30 Hz
    assert data["points"].shape[0] == 90
