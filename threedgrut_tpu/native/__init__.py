"""Native (C++) runtime components, built on demand with g++ + ctypes.

The reference's native layer drives CUDA/OptiX; on TPU the compute path is
XLA/Pallas, so the native layer here covers the HOST runtime instead — the
threaded image decoder/prefetcher that keeps the input pipeline off the GIL
(the analogue of the reference's 24 dataloader worker processes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdataloader.so")
_SRC_PATH = os.path.join(_HERE, "dataloader.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
           "-lpng", "-ljpeg", "-pthread", "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(_SRC_PATH)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dl_image_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dl_image_info.restype = ctypes.c_int
            lib.dl_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dl_decode.restype = ctypes.c_int
            lib.dl_create.argtypes = [ctypes.c_int]
            lib.dl_create.restype = ctypes.c_void_p
            lib.dl_submit.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                      ctypes.c_char_p]
            lib.dl_wait.argtypes = [
                ctypes.c_void_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.dl_wait.restype = ctypes.c_int
            lib.dl_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            _build_error = str(e)
        return _lib
