"""Micro-benchmark: the fused walked-compaction backward pieces vs the dense
unsort, at bench shapes (cap=2.92M, walked 10.4k of 22.8k windows, n=1M).

Isolates where the walked-compaction time actually goes (the full-step A/B
measured 195 vs 183.5 ms — SLOWER — despite the compact branch running).

    python tools/bench_fused_micro.py
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
    from threedgrut_tpu.ops.sorted_gather import unsort_segment_sum

    cap, n = 2917888, 1 << 20
    CHUNK = 128
    W = cap // CHUNK                      # 22796
    walked_cnt = 10434
    wcap = 1823744
    Wc = wcap // CHUNK                    # 14248
    ITERS = int(os.environ.get("ITERS", "10"))
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(0, n, cap, dtype=np.int32))
    g_windows = jnp.asarray(
        rng.normal(size=(W, 16, CHUNK)).astype(np.float32))
    ends = jnp.asarray(np.sort(rng.integers(0, cap, n)).astype(np.int32))
    wmask = jnp.asarray(
        (np.arange(W) < walked_cnt)[rng.permutation(W)])
    cnt = jnp.int32(walked_cnt)

    def tiny(x):
        # Fence with a SINGLE-ELEMENT readback: leaf[:1] of a [16, 1M]
        # array is a 4 MB tunnel transfer (~15-20 ms!) — slice after a
        # device-side flatten instead.
        return np.asarray(jnp.reshape(x, (-1,))[:1])

    def timed(name, fn, *args):
        out = fn(*args)
        tiny(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        tiny(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return out

    @jax.jit
    def dense(gw, ids, ends):
        g_rows = gw.transpose(0, 2, 1).reshape(cap, 16)
        return unsort_segment_sum(ids, [g_rows[:, i] for i in range(16)],
                                  n, ends=ends, grad_precision="bf16")
    timed("dense: transpose + 9-op bf16 sort + segsum", dense, g_windows,
          ids, ends)

    @jax.jit
    def wsel_of(wmask):
        _, wid = jax.lax.sort(
            (jnp.where(wmask, 0, 1).astype(jnp.int32),
             jnp.arange(W, dtype=jnp.int32)), num_keys=1)
        return wid[:Wc]
    wsel = timed("compact: wsel sort (22.8k)", wsel_of, wmask)

    @jax.jit
    def gathers(gw, ids, wsel):
        return gw[wsel], ids.reshape(W, CHUNK)[wsel].reshape(wcap)
    g_c, ids_c = timed("compact: window gathers (14.2k rows)", gathers,
                       g_windows, ids, wsel)

    @jax.jit
    def sort_only(g_c, ids_c):
        cols = [g_c[:, i, :].reshape(wcap) for i in range(16)]
        from threedgrut_tpu.ops.sorted_gather import _pack_pair
        pk = [_pack_pair(cols[2 * i], cols[2 * i + 1]) for i in range(8)]
        return jax.lax.sort((ids_c,) + tuple(pk), num_keys=1)
    sorted_ops = timed("compact: 9-op bf16 sort (1.82M)", sort_only, g_c,
                       ids_c)

    @jax.jit
    def ss(keys):
        return jnp.searchsorted(keys, jnp.arange(n, dtype=jnp.int32),
                                side="right", method="sort")
    timed("compact: sort-searchsorted ends (1.82M+1M)", ss, sorted_ops[0])

    from threedgrut_tpu.ops.pallas.segment_sum import (
        segment_sum_rows, segment_sum_rows_by_ids)

    @jax.jit
    def dense_sort_only(gw, ids):
        from threedgrut_tpu.ops.sorted_gather import _pack_pair
        cols = [gw[:, i, :].reshape(cap) for i in range(16)]
        pk = [_pack_pair(cols[2 * i], cols[2 * i + 1]) for i in range(8)]
        return jax.lax.sort((ids,) + tuple(pk), num_keys=1)
    dsorted = timed("dense: 9-op bf16 sort only (2.92M, win-cols)",
                    dense_sort_only, g_windows, ids)

    @jax.jit
    def dense_segsum(keys, cols, ends):
        from threedgrut_tpu.ops.sorted_gather import _unpack_bf16_pairs
        vals = _unpack_bf16_pairs(list(cols))
        return segment_sum_rows(jnp.stack(vals, 0), ends, bf16_values=True)
    timed("dense: segsum only (ends)", dense_segsum, dsorted[0],
          tuple(dsorted[1:]), ends)

    @jax.jit
    def segsum_ids(keys, cols):
        from threedgrut_tpu.ops.sorted_gather import _unpack_bf16_pairs
        vals = _unpack_bf16_pairs(list(cols))
        return segment_sum_rows_by_ids(jnp.stack(vals, 0), keys, n,
                                       bf16_values=True)
    timed("compact: segsum_by_ids only (1.82M)", segsum_ids, sorted_ops[0],
          tuple(sorted_ops[1:]))

    def _compact_impl(gw, ids, wmask, cnt):
        csum = jnp.cumsum(wmask.astype(jnp.int32))
        wsel = jnp.searchsorted(
            csum, jnp.arange(1, Wc + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        wsel = jnp.minimum(wsel, W - 1)
        vsel = jnp.arange(Wc, dtype=jnp.int32) < cnt
        ids_c = jnp.where(vsel[:, None], ids.reshape(W, CHUNK)[wsel],
                          n).reshape(wcap)
        g_c = gw[wsel]
        cols = [g_c[:, i, :].reshape(wcap) for i in range(16)]
        return unsort_segment_sum(ids_c, cols, n, ends=None,
                                  grad_precision="bf16")

    @jax.jit
    def wsel_ss(wmask):
        csum = jnp.cumsum(wmask.astype(jnp.int32))
        return jnp.searchsorted(
            csum, jnp.arange(1, Wc + 1, dtype=jnp.int32), side="left")
    timed("compact: wsel via searchsorted", wsel_ss, wmask)

    @jax.jit
    def full_compact(gw, ids, wmask, cnt):
        return _compact_impl(gw, ids, wmask, cnt)
    timed("compact: FULL pipeline", full_compact, g_windows, ids, wmask,
          cnt)

    @jax.jit
    def full_cond(gw, ids, ends, wmask, cnt):
        def compact(gw):
            return _compact_impl(gw, ids, wmask, cnt)
        def dense_b(gw):
            g_rows = gw.transpose(0, 2, 1).reshape(cap, 16)
            return unsort_segment_sum(
                ids, [g_rows[:, i] for i in range(16)], n, ends=ends,
                grad_precision="bf16")
        return jax.lax.cond(cnt <= Wc, compact, dense_b, gw)
    timed("compact: FULL pipeline under lax.cond", full_cond, g_windows,
          ids, ends, wmask, cnt)


if __name__ == "__main__":
    main()
