"""Native (C++) runtime components, bound via ctypes.

Built from preprocess.cpp into ``libtrackdlo_native.so`` (see build()).
Provides host-side preprocessing at native speed and a threaded
double-buffered raw-sequence frame feeder. All callers degrade gracefully
when the library is absent (`available()` is False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtrackdlo_native.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3; a few seconds). Rebuilds when the
    source is newer than the existing .so."""
    src = os.path.join(_DIR, "preprocess.cpp")
    if (
        os.path.exists(_LIB_PATH)
        and not force
        and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)
    ):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", src, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception as e:  # pragma: no cover
            print(f"trackdlo_tpu.native: build failed: {e}", file=sys.stderr)
            return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.tdlo_hsv_mask.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.tdlo_preprocess_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.tdlo_preprocess_frame.restype = ctypes.c_int
    lib.tdlo_feeder_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.tdlo_feeder_open.restype = ctypes.c_void_p
    lib.tdlo_feeder_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.tdlo_feeder_next.restype = ctypes.c_int
    lib.tdlo_feeder_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        return _load() is not None
    except Exception:
        return False


def hsv_mask(rgb: np.ndarray, lower, upper, multi_color: bool = False) -> np.ndarray:
    lib = _load()
    h, w = rgb.shape[:2]
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((h, w), np.uint8)
    lo = (ctypes.c_int * 3)(*lower)
    hi = (ctypes.c_int * 3)(*upper)
    lib.tdlo_hsv_mask(
        rgb.ctypes.data, h, w, lo, hi, int(multi_color), out.ctypes.data
    )
    return out


def preprocess_frame(
    rgb: np.ndarray,
    depth: np.ndarray,
    params,
    intrinsics,
    occlusion_mask: np.ndarray | None = None,
    max_points: int = 8192,
) -> np.ndarray:
    """Native fused mask→deproject→voxel-downsample → (N, 3) float64."""
    lib = _load()
    h, w = depth.shape
    rgb = np.ascontiguousarray(rgb, np.uint8)
    depth = np.ascontiguousarray(depth, np.uint16)
    occ_ptr = None
    if occlusion_mask is not None:
        occ = np.ascontiguousarray((occlusion_mask != 0).astype(np.uint8))
        if occ.ndim == 3:
            occ = occ.max(axis=-1)
        occ_ptr = occ.ctypes.data
    out = np.empty((max_points, 3), np.float64)
    lo = (ctypes.c_int * 3)(*params.hsv_lower)
    hi = (ctypes.c_int * 3)(*params.hsv_upper)
    n = lib.tdlo_preprocess_frame(
        rgb.ctypes.data, depth.ctypes.data, occ_ptr, h, w, lo, hi,
        int(params.multi_color_dlo),
        intrinsics.fx, intrinsics.fy, intrinsics.cx, intrinsics.cy,
        params.downsample_leaf_size, out.ctypes.data, max_points,
    )
    return out[:n].copy()


class FrameFeeder:
    """Threaded double-buffered reader of .tdlo raw sequences."""

    def __init__(self, path: str, n_slots: int = 4):
        lib = _load()
        nf = ctypes.c_uint32()
        hh = ctypes.c_uint32()
        ww = ctypes.c_uint32()
        self._handle = lib.tdlo_feeder_open(
            path.encode(), n_slots, ctypes.byref(nf), ctypes.byref(hh), ctypes.byref(ww)
        )
        if not self._handle:
            raise IOError(f"cannot open raw sequence {path}")
        self._lib = lib
        self.n_frames = nf.value
        self.height = hh.value
        self.width = ww.value

    def __iter__(self):
        while True:
            rgb = np.empty((self.height, self.width, 3), np.uint8)
            depth = np.empty((self.height, self.width), np.uint16)
            idx = self._lib.tdlo_feeder_next(
                self._handle, rgb.ctypes.data, depth.ctypes.data
            )
            if idx < 0:
                break
            yield rgb, depth

    def close(self):
        if self._handle:
            self._lib.tdlo_feeder_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
