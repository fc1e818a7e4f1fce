"""ctypes binding + on-demand build of the native episode loader
(csrc/episode_loader.cpp). Falls back to numpy when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger("tacorl_tpu")

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
SRC = REPO_ROOT / "csrc" / "episode_loader.cpp"
LIB = REPO_ROOT / "build" / "libepisode_loader.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

__all__ = ["get_native_lib", "gather_windows", "gather_rows"]


def _build() -> bool:
    LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
        "-std=c++17", str(SRC), "-o", str(LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native loader build failed (%s); using numpy path", e)
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not LIB.exists() or LIB.stat().st_mtime < SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(LIB))
        i64 = ctypes.c_int64
        p_u8 = ctypes.c_void_p
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        lib.gather_windows.argtypes = [p_u8, i64, p_i64, i64, i64, i64, p_u8]
        lib.gather_windows.restype = None
        lib.gather_rows.argtypes = [p_u8, i64, p_i64, i64, p_u8]
        lib.gather_rows.restype = None
        _lib = lib
        return _lib


def _rows_ptr(rows: np.ndarray):
    return rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_windows(
    array: np.ndarray,
    start_rows: Sequence[int],
    window_rows: int,
    pad_rows: int = 0,
) -> np.ndarray:
    """(B windows) x (window+pad rows) gather from a (n_steps, ...) array;
    padding repeats each window's last row."""
    rows = np.ascontiguousarray(start_rows, dtype=np.int64)
    b = len(rows)
    out_shape = (b, window_rows + pad_rows) + array.shape[1:]
    lib = get_native_lib()
    if lib is None:  # numpy fallback
        out = np.empty(out_shape, dtype=array.dtype)
        for i, r in enumerate(rows):
            out[i, :window_rows] = array[r : r + window_rows]
            if pad_rows:
                out[i, window_rows:] = out[i, window_rows - 1]
        return out
    row_bytes = int(np.prod(array.shape[1:], dtype=np.int64)) * array.itemsize
    out = np.empty(out_shape, dtype=array.dtype)
    lib.gather_windows(
        array.ctypes.data_as(ctypes.c_void_p),
        row_bytes,
        _rows_ptr(rows),
        b,
        window_rows,
        pad_rows,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def gather_rows(array: np.ndarray, rows: Sequence[int]) -> np.ndarray:
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    lib = get_native_lib()
    if lib is None:
        return array[rows].copy()
    row_bytes = int(np.prod(array.shape[1:], dtype=np.int64)) * array.itemsize
    out = np.empty((len(rows),) + array.shape[1:], dtype=array.dtype)
    lib.gather_rows(
        array.ctypes.data_as(ctypes.c_void_p),
        row_bytes,
        _rows_ptr(rows),
        len(rows),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
