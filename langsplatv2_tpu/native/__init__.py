"""Native (C++) data-path runtime, exposed through ctypes.

The compute path of this framework is JAX/XLA/Pallas on TPU; the host-side
runtime around it (per-iteration data loading, COLMAP parsing) is native
C++, mirroring how the reference used native extensions for its runtime
(SURVEY.md §2.3). `feature_loader.cpp` replaces the per-iteration
np.load + cv2-resize + fancy-gather of `Camera.get_language_feature`
(reference scene/cameras.py:59-96) with a memory-mapped, multithreaded
loader.

The library auto-builds on first use when a toolchain is available
(`make -C langsplatv2_tpu/native`); all callers fall back to the numpy
path transparently when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfeature_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _DIR],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.lsv2_load_language_feature.restype = ctypes.c_int64
        lib.lsv2_load_language_feature.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.lsv2_read_points3d_bin.restype = ctypes.c_int64
        lib.lsv2_read_points3d_bin.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_language_feature(seg_path: str, feat_path: str, level: int,
                          height: int, width: int, feat_dim: int = 512):
    """Native equivalent of Camera.get_language_feature: returns
    (features [D, H, W] f32, mask [1, H, W] bool) or None if the native
    library is unavailable or the files are unsupported."""
    lib = _load()
    if lib is None:
        return None
    feat = np.empty((feat_dim, height, width), np.float32)
    mask = np.empty((height, width), np.uint8)
    d = lib.lsv2_load_language_feature(
        seg_path.encode(), feat_path.encode(), level, height, width,
        feat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if d != feat_dim:
        return None
    return feat, mask.astype(bool)[None]


def read_points3d_bin(path: str):
    """Native COLMAP points3D.bin reader. Returns (xyz [n,3] f64,
    rgb [n,3] u8, error [n] f64) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    null_d = ctypes.POINTER(ctypes.c_double)()
    null_u = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.lsv2_read_points3d_bin(path.encode(), 0, null_d, null_u, null_d)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.lsv2_read_points3d_bin(
        path.encode(), n,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n:
        return None
    return xyz, rgb, err
