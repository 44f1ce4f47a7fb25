"""Python-facing prefetching image loader over the native C++ decoder.

Falls back to PIL when the native library cannot be built. Typical use:

    loader = ImageLoader(n_threads=8)
    loader.prefetch([path0, path1, ...])      # pipeline ahead
    img = loader.get(path0)                    # float32 [H, W, C] in [0, 1]
"""
from __future__ import annotations

import ctypes
from typing import Dict, List, Optional

import numpy as np

from threedgrut_tpu.native import load_library


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path), dtype=np.float32) / 255.0


class ImageLoader:
    def __init__(self, n_threads: int = 8,
                 max_bytes: int = 64 * 1024 * 1024):
        self._lib = load_library()
        self._handle = None
        self._tickets: Dict[str, int] = {}
        self._next_ticket = 0
        self._cap = max_bytes // 4
        if self._lib is not None:
            self._handle = self._lib.dl_create(n_threads)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def prefetch(self, paths: List[str]) -> None:
        if self._handle is None:
            return
        for p in paths:
            if p not in self._tickets:
                self._tickets[p] = self._next_ticket
                self._lib.dl_submit(self._handle, self._next_ticket,
                                    p.encode())
                self._next_ticket += 1

    def get(self, path: str) -> np.ndarray:
        if self._handle is None:
            return _pil_decode(path)
        if path not in self._tickets:
            self.prefetch([path])
        ticket = self._tickets.pop(path)
        buf = np.empty(self._cap, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rc = self._lib.dl_wait(
            self._handle, ticket,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._cap, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
        if rc != 0:
            return _pil_decode(path)
        n = w.value * h.value * c.value
        return buf[:n].reshape(h.value, w.value, c.value).copy()

    def decode(self, path: str) -> np.ndarray:
        """Synchronous single-image decode (no prefetch queue)."""
        if self._lib is None:
            return _pil_decode(path)
        buf = np.empty(self._cap, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rc = self._lib.dl_decode(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._cap, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
        if rc != 0:
            return _pil_decode(path)
        n = w.value * h.value * c.value
        return buf[:n].reshape(h.value, w.value, c.value).copy()

    def __del__(self):
        if self._handle is not None and self._lib is not None:
            self._lib.dl_destroy(self._handle)
            self._handle = None
