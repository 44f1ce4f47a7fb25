"""Micro-benchmarks for sort/payload strategy decisions (v5e, cap=3.4M).

Answers: how does lax.sort cost scale with operand count, what does the
17-operand gradient reorder in sorted_gather._bwd actually cost, and is
carrying the 16 packed-row channels as sort payload cheaper than the
post-sort gather?

    python tools/bench_sort_micro.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cap = 3369728
    ITERS = int(os.environ.get("ITERS", "10"))
    rng = np.random.default_rng(0)
    tile_key = jnp.asarray(rng.integers(0, 2501, cap, dtype=np.int32))
    depth_key = jnp.asarray(rng.uniform(1, 8, cap).astype(np.float32))
    perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
    payload = [jnp.asarray(rng.normal(size=cap).astype(np.float32))
               for _ in range(16)]
    slot = jnp.arange(cap, dtype=jnp.int32)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:36s} {dt:8.2f} ms", flush=True)
        return out

    for n_ops in (2, 4, 6, 9, 12, 17, 20):
        ops = (tile_key, depth_key) + tuple(payload[: n_ops - 2])

        @jax.jit
        def do_sort(*o):
            return jax.lax.sort(o, num_keys=2)
        timed(f"lex sort {n_ops} ops (2 keys)", do_sort, *ops)

    # The sorted_gather backward reorder: 1 key + 16 payload.
    ops17 = (perm,) + tuple(payload)

    @jax.jit
    def do_sort17(*o):
        return jax.lax.sort(o, num_keys=1)
    timed("perm sort 17 ops (1 key)", do_sort17, *ops17)

    # Same but key is already-sorted (frame coherence best case).
    ops17s = (slot,) + tuple(payload)
    timed("perm sort 17 ops (sorted key)", do_sort17, *ops17s)

    # Stack 16 channels -> [16, cap] (segment_sum input prep).
    @jax.jit
    def do_stack(*o):
        return jnp.stack(o, axis=0)
    timed("stack 16 -> [16, cap]", do_stack, *payload)

    # segment_sum_rows on its own.
    from threedgrut_tpu.ops.pallas.segment_sum import segment_sum_rows
    n = 1_000_000
    n_pad = -(-n // 256) * 256
    counts = rng.integers(0, 7, n)
    ends = np.minimum(np.cumsum(counts), cap).astype(np.int32)
    e_pad = np.concatenate([ends, np.full(n_pad - n, ends[-1], np.int32)])
    g_cm = jnp.stack(payload, axis=0)
    e_j = jnp.asarray(e_pad)

    @jax.jit
    def do_segsum(g, e):
        return segment_sum_rows(g, e)
    timed("segment_sum_rows [16, cap]", do_segsum, g_cm, e_j)

    # Full sorted_gather backward for reference.
    from threedgrut_tpu.ops import sorted_gather as sg
    g_rows = jnp.stack(payload, axis=1)
    ends_full = jnp.asarray(ends)
    counts_full = jnp.asarray(counts.astype(np.int32))

    @jax.jit
    def do_sg_bwd(g, p, e, c):
        return sg._bwd("f32", (n, p, e, c), g)
    timed("sorted_gather _bwd total", do_sg_bwd, g_rows, perm, ends_full,
          counts_full)

    @jax.jit
    def do_sg_bwd16(g, p, e, c):
        return sg._bwd("bf16", (n, p, e, c), g)
    timed("sorted_gather _bwd bf16", do_sg_bwd16, g_rows, perm, ends_full,
          counts_full)

    print("done")


if __name__ == "__main__":
    main()
