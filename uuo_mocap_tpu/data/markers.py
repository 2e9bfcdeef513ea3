"""Marker-cloud containers (reference ``markers/markers.py``).

``Markers`` reads .c3d files through the pure-Python/C++ reader in
``uuo_mocap_tpu.data.c3d`` (replacing the ezc3d C++ dependency,
SURVEY.md §2.9); ``ArrayMarkers`` wraps in-memory arrays (synthetic data,
tests).  Unit scaling m/cm/mm follows the C3D POINT:UNITS parameter.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

_UNIT_SCALE = {"m": 1.0, "cm": 100.0, "mm": 1000.0}


class ArrayMarkers:
    def __init__(self, points: np.ndarray, freq: float = 30.0, labels: Optional[List[str]] = None):
        self.points = np.asarray(points, np.float32)
        self.freq = float(freq)
        self.labels = labels or []

    def get_points(self) -> np.ndarray:
        return self.points

    def set_points(self, points: np.ndarray) -> None:
        self.points = points

    def get_labels(self) -> List[str]:
        return self.labels

    def get_num_markers(self) -> int:
        return self.points.shape[1]

    def __len__(self) -> int:
        return self.points.shape[0]

    def get_duration(self) -> float:
        return self.freq * self.points.shape[0]

    def get_frequency(self) -> float:
        return self.freq


class Markers(ArrayMarkers):
    """C3D-backed markers with per-frame shuffle support
    (reference ``markers/markers.py:6-54``)."""

    def __init__(self, filename: str, shuffle: bool = False, rng: Optional[np.random.RandomState] = None):
        from uuo_mocap_tpu.data.c3d import read_c3d

        data = read_c3d(filename)
        units = data.get("units", "m")
        scale = _UNIT_SCALE.get(units, 1.0)
        points = data["points"][:, :, :3] / scale  # [F, M, 3]

        if shuffle:
            rng = rng or np.random
            shuffled = np.zeros_like(points)
            for f in range(points.shape[0]):
                shuffled[f] = points[f, rng.permutation(points.shape[1])]
            points = shuffled

        super().__init__(points, freq=data["rate"], labels=data.get("labels", []))
        self.filename = filename
