"""Native C++ C3D library: parser parity vs the pure-Python implementation,
prefetcher behavior, and error paths."""
import os

import numpy as np
import pytest

from uuo_mocap_tpu.data.c3d import read_c3d, write_c3d
from uuo_mocap_tpu.data.c3d_native import SequencePrefetcher, get_lib, read_c3d_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib not built (no g++?)")


def test_native_matches_python(tmp_path):
    rng = np.random.RandomState(1)
    pts = rng.randn(120, 17, 3).astype(np.float32)
    path = str(tmp_path / "t.c3d")
    write_c3d(path, pts, rate=240.0, units="mm", labels=[f"L{i}" for i in range(17)])

    nat = read_c3d_native(path)
    py = read_c3d(path, use_native=False)
    np.testing.assert_allclose(nat["points"], py["points"], atol=1e-6)
    assert nat["rate"] == py["rate"]
    assert nat["units"] == py["units"] == "mm"
    assert nat["labels"] == py["labels"]


def test_native_error_on_garbage(tmp_path):
    path = str(tmp_path / "bad.c3d")
    with open(path, "wb") as f:
        f.write(b"\x00" * 1024)
    with pytest.raises(ValueError):
        read_c3d_native(path)


def test_prefetcher_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.c3d")
        write_c3d(p, rng.randn(50, 9, 3).astype(np.float32), rate=30.0, units="m")
        paths.append(p)

    pf = SequencePrefetcher(2)
    for p in paths:
        pf.enqueue(p)
    for p in paths:
        d = pf.get(p)
        assert d["points"].shape == (50, 9, 4)
    pf.close()


def test_markers_reads_through_native(tmp_path):
    from uuo_mocap_tpu.data.markers import Markers

    rng = np.random.RandomState(3)
    pts = rng.randn(30, 5, 3).astype(np.float32)
    path = str(tmp_path / "m.c3d")
    write_c3d(path, pts, rate=60.0, units="m")
    m = Markers(path)
    np.testing.assert_allclose(m.get_points(), pts, atol=1e-6)
    assert m.get_frequency() == 60.0
