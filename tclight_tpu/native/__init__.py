"""ctypes bindings for the native host-side track machinery
(libtclight_native.so, built from flowid.cpp via `make -C tclight_tpu/native`).

`get_flowid_native` / `unique_inverse_native` / `segment_mean_native`
mirror the jitted ops in ops/flow.py; the data layer prefers them for long
videos (frame-sequential host loop — the one place where XLA dispatch
overhead dominates). Falls back gracefully when the library is absent;
`ensure_built()` compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libtclight_native.so"
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    global _lib
    if _lib is not None:
        return True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)],
                check=True,
                capture_output=quiet,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return False
    lib.tcl_flowid_propagate.restype = ctypes.c_int64
    lib.tcl_flowid_propagate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
    ]
    lib.tcl_unique_inverse.restype = ctypes.c_int64
    lib.tcl_unique_inverse.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.tcl_segment_mean.restype = None
    lib.tcl_segment_mean.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return True


def available() -> bool:
    return ensure_built()


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def get_flowid_native(frames: np.ndarray, flows: np.ndarray,
                      masks: np.ndarray, rgb_threshold: float = 0.01
                      ) -> np.ndarray:
    """frames (N,H,W,C) f32, flows (>=N-1,H,W,2) f32, masks (N,H,W) f32
    -> int32 (N,H,W) track ids."""
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    frames = np.ascontiguousarray(frames, np.float32)
    n, h, w, c = frames.shape
    flows_full = np.zeros((n, h, w, 2), np.float32)
    flows_full[: flows.shape[0]] = flows[:n]
    masks = np.ascontiguousarray(masks, np.float32)
    out = np.empty((n, h, w), np.int32)
    _lib.tcl_flowid_propagate(
        _fptr(frames), _fptr(flows_full), _fptr(masks), _iptr(out),
        n, h, w, c, ctypes.c_float(rgb_threshold),
    )
    return out


def unique_inverse_native(ids: np.ndarray) -> tuple[np.ndarray, int]:
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    ids = np.ascontiguousarray(ids.reshape(-1), np.int32)
    inv = np.empty_like(ids)
    n_unique = _lib.tcl_unique_inverse(_iptr(ids), _iptr(inv), ids.size)
    return inv, int(n_unique)


def segment_mean_native(vals: np.ndarray, inv: np.ndarray,
                        n_unique: int) -> np.ndarray:
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    vals = np.ascontiguousarray(vals, np.float32)
    inv = np.ascontiguousarray(inv, np.int32)
    count, c = vals.shape
    out = np.empty((n_unique, c), np.float32)
    _lib.tcl_segment_mean(_fptr(vals), _iptr(inv), _fptr(out),
                          count, c, n_unique)
    return out
