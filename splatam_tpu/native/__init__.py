"""Native (C++) frame-decode library: build-on-first-use + ctypes binding.

See frame_loader.cpp. The library is optional — everything falls back to
imageio/cv2 when g++ or the image libraries are unavailable; when present,
`NativeFrameDecoder` decodes JPEG/PNG and resizes into float32 with the GIL
released, so a thread pool gives genuinely parallel frame loading
(data/prefetch.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "frame_loader.cpp")
_LIB = os.path.join(_HERE, "libframeloader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # compile to a pid-unique temp path and rename into place: concurrent
    # processes (pytest-xdist workers) may build simultaneously, and a
    # reader dlopen-ing a half-written .so gets an OSError
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp,
        "-ljpeg", "-lpng", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        print(f"[native] frame_loader build failed ({e}); using python decode")
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # stale/corrupt .so (e.g. left by a killed build) — rebuild once
            if not _build():
                _build_failed = True
                return None
            lib = ctypes.CDLL(_LIB)
        lib.decode_jpeg_rgb_f32.restype = ctypes.c_int
        lib.decode_jpeg_rgb_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.decode_png_f32.restype = ctypes.c_int
        lib.decode_png_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.png_info_probe.restype = ctypes.c_int
        lib.png_info_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


class NativeFrameDecoder:
    """Decode+resize straight to float32 (ctypes drops the GIL per call)."""

    def __init__(self):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native frame loader unavailable")

    def jpeg_rgb(self, path: str, out_h: int, out_w: int) -> np.ndarray:
        data = open(path, "rb").read()
        out = np.empty((out_h, out_w, 3), np.float32)
        rc = self.lib.decode_jpeg_rgb_f32(
            data, len(data), out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise ValueError(f"jpeg decode failed ({rc}): {path}")
        return out

    def png(self, path: str, out_h: int, out_w: int, channels: int,
            nearest: bool) -> np.ndarray:
        data = open(path, "rb").read()
        out = np.empty((out_h, out_w, channels), np.float32)
        rc = self.lib.decode_png_f32(
            data, len(data), out_h, out_w, channels, 1 if nearest else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise ValueError(f"png decode failed ({rc}): {path}")
        return out

    def png_channels(self, path: str) -> int:
        data = open(path, "rb").read()
        sh = ctypes.c_int()
        sw = ctypes.c_int()
        ch = ctypes.c_int()
        bd = ctypes.c_int()
        rc = self.lib.png_info_probe(
            data, len(data), ctypes.byref(sh), ctypes.byref(sw),
            ctypes.byref(ch), ctypes.byref(bd),
        )
        if rc != 0:
            raise ValueError(f"png probe failed ({rc}): {path}")
        return ch.value


def native_available() -> bool:
    return load_library() is not None
