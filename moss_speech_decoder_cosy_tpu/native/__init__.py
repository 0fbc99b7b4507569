"""First-party native (C++) serving primitives.

Compiled on first import with the system toolchain (g++ -O3 -shared) into
the package directory and bound through ctypes; everything degrades to the
numpy implementations if no compiler is available, so the native layer is
an accelerator, never a dependency.

Exposed: ``pcm16_encode``, ``pcm16_decode``, ``crossfade`` — the per-frame
host work on the websocket serving path (the role sphn/torch play for the
reference's server.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "audio_kernels.cpp")
_LIB_PATH = os.path.join(_DIR, "_audio_kernels.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, f32p, i16p = (ctypes.c_int64,
                       ctypes.POINTER(ctypes.c_float),
                       ctypes.POINTER(ctypes.c_int16))
    lib.pcm16_from_float.argtypes = [f32p, i64, i16p]
    lib.float_from_pcm16.argtypes = [i16p, i64, f32p]
    lib.crossfade.argtypes = [f32p, f32p, f32p, f32p, i64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def pcm16_encode(x: np.ndarray) -> bytes:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    if lib is None:
        return (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()
    out = np.empty(x.shape[0], "<i2")
    lib.pcm16_from_float(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out.tobytes()


def pcm16_decode(data: bytes) -> np.ndarray:
    lib = _load()
    i16 = np.frombuffer(data, "<i2")
    if lib is None:
        return i16.astype(np.float32) / 32768.0
    out = np.empty(i16.shape[0], np.float32)
    src = np.ascontiguousarray(i16)
    lib.float_from_pcm16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), i16.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def crossfade(head: np.ndarray, tail: np.ndarray, win_in: np.ndarray,
              win_out: np.ndarray) -> np.ndarray:
    """head*win_in + tail*win_out over the overlap region, in place on a
    copy of head."""
    lib = _load()
    head = np.array(head, np.float32)
    if lib is None:
        return head * win_in + tail * win_out
    t = np.ascontiguousarray(tail, np.float32)
    wi = np.ascontiguousarray(win_in, np.float32)
    wo = np.ascontiguousarray(win_out, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.crossfade(head.ctypes.data_as(f32p), t.ctypes.data_as(f32p),
                  wi.ctypes.data_as(f32p), wo.ctypes.data_as(f32p),
                  head.shape[0])
    return head
