"""Probe TPU gather formulations at bench scale (cap=3.37M rows from N=1M).

The fwd gather packed[sorted_idx] measures ~25 ms and is claimed row-
dispatch-bound (PARITY.md). This probes alternative lowerings:
  * row-major rows:            out[j, :]  = packed[idx[j], :]
  * channel-major along lanes: out[:, j]  = packed_cm[:, idx[j]]
  * take / one-hot variants
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n, cap, F = 1_000_000, 3369728, 16
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    packed_cm = jnp.asarray(np.ascontiguousarray(
        np.asarray(packed).T))                       # [F, n]
    idx = jnp.asarray(rng.integers(0, n, cap, dtype=np.int32))
    idx_seq = jnp.asarray((np.arange(cap) % n).astype(np.int32))

    def timed(name, fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out.reshape(-1)[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:40s} {dt:8.2f} ms", flush=True)

    timed("row gather [cap,16]", jax.jit(lambda p, i: p[i]), packed, idx)
    timed("row gather seq idx", jax.jit(lambda p, i: p[i]), packed, idx_seq)
    timed("cm gather [16,cap] lanes", jax.jit(lambda p, i: p[:, i]),
          packed_cm, idx)
    timed("cm gather seq idx", jax.jit(lambda p, i: p[:, i]),
          packed_cm, idx_seq)
    timed("take axis0", jax.jit(lambda p, i: jnp.take(p, i, axis=0)),
          packed, idx)
    timed("row gather 8ch", jax.jit(lambda p, i: p[i]), packed[:, :8], idx)
    timed("row gather 32ch",
          jax.jit(lambda p, i: p[i]),
          jnp.concatenate([packed, packed], -1), idx)
    # 2 half-size gathers (even/odd slots) — does dispatch parallelize?
    timed("2x half row gather",
          jax.jit(lambda p, i: jnp.concatenate(
              [p[i[:cap // 2]], p[i[cap // 2:]]])),
          packed, idx)


if __name__ == "__main__":
    main()
