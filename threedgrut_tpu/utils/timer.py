"""Timers: host-scoped and device-synchronized.

Reference: threedgrut/utils/timer.py (ScopedTimer host registry + CudaTimer
cuda-event pairs). TPU equivalents: a host perf_counter scope, and a device
timer that forces completion with a tiny host readback — under remote-tunnel
runtimes `block_until_ready` alone may not actually wait (this repo's axon
setup), so `DeviceTimer.sync` fetches one element instead. For deep kernel
timing use `jax.profiler.trace` + Perfetto (the NVTX/nsight analogue).
"""
from __future__ import annotations

import collections
import time
from typing import Dict

import numpy as np


_REGISTRY: Dict[str, list] = collections.defaultdict(list)


class ScopedTimer:
    """with ScopedTimer("name"): ... — accumulates into a global registry."""

    def __init__(self, name: str, enabled: bool = True):
        self.name = name
        self.enabled = enabled

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            _REGISTRY[self.name].append(time.perf_counter() - self.t0)
        return False


def timings_summary() -> Dict[str, Dict[str, float]]:
    out = {}
    for k, v in _REGISTRY.items():
        arr = np.asarray(v)
        out[k] = {"mean_s": float(arr.mean()), "total_s": float(arr.sum()),
                  "count": int(arr.size)}
    return out


def reset_timings() -> None:
    _REGISTRY.clear()


def device_sync(x) -> None:
    """Force completion of a device value (works through remote tunnels where
    block_until_ready may return early): fetch one element to host."""
    import jax
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


class DeviceTimer:
    """Measure device wall time of a callable including completion.

    Keeps the last `window` samples (the reference keeps a deque of <=100
    cudaEvent timers, splatRaster.cpp:108-151)."""

    def __init__(self, window: int = 100):
        self.samples = collections.deque(maxlen=window)

    def measure(self, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        self.samples.append(time.perf_counter() - t0)
        return out

    @property
    def mean_ms(self) -> float:
        return 1000.0 * float(np.mean(self.samples)) if self.samples else 0.0
