"""ctypes binding for the native C3D library (cpp/libuuoc3d.so).

The pure-Python parser in ``data/c3d.py`` is the fallback; the native path
parses large capture files off the GIL and powers the sequence prefetcher
that overlaps file IO with TPU solves (the reference's batch loop is fully
sequential, ``test/test.py:50-147``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Dict, List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "cpp", "libuuoc3d.so")


def _build() -> bool:
    cpp_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(["make", "-C", cpp_dir], check=True, capture_output=True, timeout=120)
        return os.path.exists(_lib_path())
    except Exception:
        return False


def get_lib(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build:
        _build()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.uuoc3d_read.restype = ctypes.c_void_p
    lib.uuoc3d_read.argtypes = [ctypes.c_char_p]
    lib.uuoc3d_error.restype = ctypes.c_char_p
    lib.uuoc3d_error.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_frames.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_markers.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_rate.restype = ctypes.c_float
    lib.uuoc3d_rate.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_units.restype = ctypes.c_char_p
    lib.uuoc3d_units.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_points.restype = ctypes.POINTER(ctypes.c_float)
    lib.uuoc3d_points.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_num_labels.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_label.restype = ctypes.c_char_p
    lib.uuoc3d_label.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.uuoc3d_free.argtypes = [ctypes.c_void_p]
    lib.uuoc3d_prefetcher_create.restype = ctypes.c_void_p
    lib.uuoc3d_prefetcher_create.argtypes = [ctypes.c_int]
    lib.uuoc3d_prefetcher_enqueue.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.uuoc3d_prefetcher_wait.restype = ctypes.c_void_p
    lib.uuoc3d_prefetcher_wait.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.uuoc3d_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _handle_to_dict(lib: ctypes.CDLL, handle: int) -> Dict[str, Any]:
    err = lib.uuoc3d_error(handle)
    if err:
        msg = err.decode()
        lib.uuoc3d_free(handle)
        raise ValueError(f"c3d parse failed: {msg}")
    F = lib.uuoc3d_frames(handle)
    M = lib.uuoc3d_markers(handle)
    buf = np.ctypeslib.as_array(lib.uuoc3d_points(handle), shape=(F, M, 4)).copy()
    labels: List[str] = [lib.uuoc3d_label(handle, i).decode() for i in range(lib.uuoc3d_num_labels(handle))]
    out = {
        "points": buf,
        "rate": float(lib.uuoc3d_rate(handle)),
        "units": lib.uuoc3d_units(handle).decode(),
        "labels": labels,
        "first_frame": 1,
        "num_points": M,
    }
    lib.uuoc3d_free(handle)
    return out


def read_c3d_native(filename: str) -> Optional[Dict[str, Any]]:
    """Parse via the native library; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.uuoc3d_read(filename.encode())
    return _handle_to_dict(lib, handle)


class SequencePrefetcher:
    """Thread-pool prefetch of c3d files: enqueue upcoming sequences, wait
    for the current one — parsing overlaps the TPU solve."""

    def __init__(self, n_threads: int = 4):
        self._lib = get_lib()
        if self._lib is None:
            self._handle = None  # degrade to synchronous reads
        else:
            self._handle = self._lib.uuoc3d_prefetcher_create(n_threads)

    def enqueue(self, path: str) -> None:
        if self._handle is not None:
            self._lib.uuoc3d_prefetcher_enqueue(self._handle, path.encode())

    def get(self, path: str) -> Dict[str, Any]:
        if self._handle is None:
            from uuo_mocap_tpu.data.c3d import read_c3d

            return read_c3d(path)
        h = self._lib.uuoc3d_prefetcher_wait(self._handle, path.encode())
        return _handle_to_dict(self._lib, h)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.uuoc3d_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
