"""ctypes bindings for the native glimpse decoder (glimpse_io.cpp).

Compiled on first import with g++ (cached next to the source); importing
this module raises if no compiler/toolchain is available, and callers fall
back to the numpy path (tapqir_tpu/imscroll/glimpse_reader.py:__getitem__).
"""

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "glimpse_io.cpp"
_SO = _HERE / "_glimpse_io.so"
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
        check=True,
        capture_output=True,
    )


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
            lib.read_frame_i32.restype = ctypes.c_int
            lib.read_frame_i32.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.read_frames_i32.restype = ctypes.c_int
            lib.read_frames_i32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.crop_aois_i32.restype = ctypes.c_int
            lib.crop_aois_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
    return _lib


def read_frame(path, offset, height, width):
    """Decoded frame as int32 (already +2^15 shifted). Raises on failure."""
    lib = _get_lib()
    out = np.empty((height, width), np.int32)
    rc = lib.read_frame_i32(
        str(path).encode(), int(offset), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise IOError(f"glimpse_native.read_frame failed (code {rc}): {path}")
    # match the numpy fallback which returns img + 2^15 applied by caller:
    # this function returns the SHIFTED values, so subtract the shift the
    # caller will re-add
    return out - 32768


def read_frames(path, offsets, height, width):
    """Batch-decode frames from one file; returns (n, H, W) int32 SHIFTED
    (+2^15 applied)."""
    lib = _get_lib()
    offsets = np.ascontiguousarray(offsets, np.int64)
    n = len(offsets)
    out = np.empty((n, height, width), np.int32)
    rc = lib.read_frames_i32(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise IOError(f"glimpse_native.read_frames failed (code {rc}): {path}")
    return out


def crop_aois(img, sx, sy, P):
    """(n_aoi, P, P) crops of a decoded int32 frame."""
    lib = _get_lib()
    img = np.ascontiguousarray(img, np.int32)
    sx = np.ascontiguousarray(sx, np.int32)
    sy = np.ascontiguousarray(sy, np.int32)
    n = len(sx)
    out = np.empty((n, P, P), np.int32)
    rc = lib.crop_aois_i32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        img.shape[0], img.shape[1],
        sx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sy.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, P,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise IOError(f"glimpse_native.crop_aois failed (code {rc})")
    return out
