"""Shape-bucketed batch grouping of the CLI work list (VERDICT r2 item 7):
mixed-shape datasets (15 s CMU windows next to 3 s MOYO windows,
Benchmarks.md:18-31) must group by (frame-bucket, marker-bucket) so no
sequence pads to a differently-shaped neighbor.  The reference has no batch
grouping at all — its loop is one file at a time (``test/test.py:50-147``).
"""
import numpy as np

from uuo_mocap_tpu.cli.test import bucket_work_by_shape
from uuo_mocap_tpu.data.c3d import peek_c3d_shape, write_c3d


def _write(tmp_path, name, F, M):
    path = str(tmp_path / name)
    write_c3d(path, np.zeros((F, M, 3), np.float32), rate=30.0)
    return path


def test_peek_matches_header(tmp_path):
    path = _write(tmp_path, "a.c3d", 123, 17)
    assert peek_c3d_shape(path) == (123, 17)


def test_buckets_group_compatible_shapes(tmp_path):
    # interleaved long/short sequences in directory order — the round-2
    # grouping would pad every short window to 450 frames
    shapes = [(450, 41), (90, 30), (450, 41), (90, 30), (450, 41), (90, 30)]
    work = [
        {"markers_file": _write(tmp_path, f"s{i}.c3d", F, M), "seq_name": f"s{i}"}
        for i, (F, M) in enumerate(shapes)
    ]
    out = bucket_work_by_shape(work, frame_bucket=64, marker_bucket=8)
    keys = [peek_c3d_shape(item["markers_file"]) for item in out]
    # all short windows first (bucket (2, 4)), then all long ones (8, 6)
    assert keys == [(90, 30)] * 3 + [(450, 41)] * 3
    # stable within a bucket: directory order preserved
    assert [it["seq_name"] for it in out] == ["s1", "s3", "s5", "s0", "s2", "s4"]


def test_unreadable_files_sort_last(tmp_path):
    good = {"markers_file": _write(tmp_path, "ok.c3d", 64, 8), "seq_name": "ok"}
    bad = {"markers_file": str(tmp_path / "missing.c3d"), "seq_name": "bad"}
    out = bucket_work_by_shape([bad, good])
    assert [it["seq_name"] for it in out] == ["ok", "bad"]
