"""Pallas TPU multi-stream compaction: the 3DGRT cull's member partition.

Replaces the flat two-level cull's dominant stage — the segmented
member-column depth sort ([16 members x capS] keys (super, depth), 381 ms
at the 1M bench — RESULTS.md) — with a bulk-synchronous 16-way stream
compaction: each flat super slot carries a 16-bit membership mask (which
member bundles' cones it passed) and per-member depths; the kernel walks a
super's windows once and left-packs, PER MEMBER, the (gid, depth) pairs of
its hits into that member's contiguous CHUNK-aligned output range —
preserving super-list (depth-ascending along the super axis) order. A
single [capF] (bundle, depth) lax.sort afterwards restores EXACT per-bundle
member-depth order, so end-to-end semantics are identical to the sorted
path at a fraction of the comparator mass (the sort it replaces moves
16*capS elements; the compaction touches each of the ~capF true hits once,
and the exactness sort runs at capF ~ 0.7*capS).

Kernel design (no scatter, no atomics):
  * Sequential grid over SUPERS. Per input window [R, CHUNK] (channels x
    slots: gid row, mask-bits row, 16 member-depth rows), exclusive ranks
    for ALL members come from ONE [16, CHUNK] x lower-triangular-ones MXU
    matmul (exact: 0/1 inputs, integer sums < 2^8).
  * Per member with any hit in the window (sparsity-predicated — most
    (window, member) pairs are empty because a member's hits cluster in
    its cone's depth range), a [2*CHUNK, CHUNK] one-hot routing matmul
    accumulates the hits into a double-width VMEM staging buffer at the
    member's cursor (HIGHEST precision: exact one-term sums).
  * When a member's staging crosses CHUNK, the low half flushes to HBM at
    the member's next output window (dynamic-offset DMA through a write
    ring, like the backward kernels' gradient writes); segment end flushes
    residuals padded with (gid 0, depth +inf) — pad slots sort to their
    bundle segment's end and are masked by the caller's valid mask.
  * Output is [2, capF] channel-major (gid, depth); windows never written
    (beyond the true total) keep the donor's (0, +inf) — the same
    overflow-as-data truncation semantics as grt.flatten_candidates.

Reference role: this is the TPU analogue of the stream compactions CUB
performs inside the reference's binning/traversal pipelines (DeviceSelect/
DeviceRadixSort) — done here with MXU one-hot routing instead of warp
ballots and atomics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.ops.pallas.tile_raster import CHUNK

_N_DBUF = 3     # input prefetch ring
_N_WBUF = 8     # output write ring
_FILL_DEPTH = 3.4e38


def _kernel(seg_ws_ref, seg_we_ref, base_ref, lim_ref, vals_hbm, donor_hbm,
            out_ref, dbuf, staging, wbuf, sem, wsem, wstate, *, n_streams):
    """Grid over segments (supers). vals_hbm: [nws, R, CHUNK] with R =
    8-aligned rows: row 0 gid, row 1 mask bits (f32-exact ints), rows
    2..2+S member depths. base_ref/lim_ref: [n_seg * S] first / one-past-
    last output WINDOW per stream, (segment-major, member-minor) order —
    lim also encodes flat-capacity and per-stream count clamps (writes at
    or past the limit are suppressed: truncation keeps the FIRST hits in
    stream order, overflow is the caller's flag). out_ref: [2, capF] —
    row 0 gid, row 1 depth."""
    del donor_hbm
    sp = pl.program_id(0)
    S = n_streams
    w0 = seg_ws_ref[sp]
    w1 = seg_we_ref[sp]

    @pl.when(sp == 0)
    def _():
        wstate[0] = 0
        for i in range(_N_WBUF):
            wstate[1 + i] = -1

    def dma_in(w, slot):
        return pltpu.make_async_copy(vals_hbm.at[w], dbuf.at[slot],
                                     sem.at[slot])

    def wait_write(i):
        # Reconstruct the tracked copy (ring slot i -> its dest window) to
        # complete it — the emit_g/wstate pattern of the backward kernels.
        @pl.when(wstate[1 + i] >= 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[i], out_ref.at[:, pl.ds(wstate[1 + i] * CHUNK,
                                                CHUNK)],
                wsem.at[i]).wait()
        wstate[1 + i] = -1

    for k in range(2):
        @pl.when(w0 + k < w1)
        def _(k=k):
            dma_in(w0 + k, (w0 + k) % _N_DBUF).start()

    # Per-stream staging init: gid 0, depth +inf across the double width.
    fill = jnp.concatenate([
        jnp.zeros((1, 2 * CHUNK), jnp.float32),
        jnp.full((1, 2 * CHUNK), _FILL_DEPTH, jnp.float32)], axis=0)
    for s in range(S):
        staging[s] = fill

    # Constants hoisted out of the window loop. lowtri[l, j] = (l < j):
    # contracting sel's lane axis against dim 0 gives EXCLUSIVE prefix
    # counts (rank of lane j among selected lanes).
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    lowtri = (sub < lane).astype(jnp.float32)
    bit = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    dlane = jax.lax.broadcasted_iota(jnp.int32, (2 * CHUNK, CHUNK), 0)

    def flush(s, dw):
        """Emit staging[s][:, :CHUNK] to output window dw via the ring."""
        k = wstate[0]
        i = k % _N_WBUF
        wait_write(i)
        wbuf[i] = staging[s][:, :CHUNK]
        pltpu.make_async_copy(wbuf.at[i],
                              out_ref.at[:, pl.ds(dw * CHUNK, CHUNK)],
                              wsem.at[i]).start()
        wstate[1 + i] = dw
        wstate[0] = k + 1
        # Shift left one CHUNK; refill the upper half with the pad pattern.
        staging[s] = jnp.concatenate(
            [staging[s][:, CHUNK:], fill[:, :CHUNK]], axis=1)

    def body(state):
        w = state[0]
        cursors = state[1:1 + S]
        dwins = state[1 + S:1 + 2 * S]
        slot = w % _N_DBUF
        dma_in(w, slot).wait()

        @pl.when(w + 2 < w1)
        def _():
            dma_in(w + 2, (w + 2) % _N_DBUF).start()

        V = dbuf[slot]                                 # [R, CHUNK]
        gid = V[0, :][None, :]                         # [1, CHUNK]
        bits = V[1, :].astype(jnp.int32)[None, :]      # [1, CHUNK]
        sel = ((jax.lax.broadcast_in_dim(bits, (S, CHUNK), (0, 1)) >> bit)
               & 1).astype(jnp.float32)                # [S, CHUNK]
        # Exclusive ranks for all members at once (exact integer sums).
        ranks = jax.lax.dot_general(
            sel, lowtri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # [S, CHUNK]

        new_state = [w + 1]
        new_cursors = []
        new_dwins = []
        for s in range(S):
            cnt_s = jnp.sum(sel[s, :]).astype(jnp.int32)
            cur = cursors[s]
            dw = dwins[s]

            @pl.when(cnt_s > 0)
            def _(s=s, cur=cur):
                # Route this window's hits to staging lanes cur + rank.
                dest = ranks[s, :][None, :] + cur.astype(jnp.float32)
                onehot = jnp.where(
                    (dlane.astype(jnp.float32) == dest) & (sel[s, :] > 0.0),
                    1.0, 0.0)                          # [2*CHUNK, CHUNK]
                routed = jax.lax.dot_general(
                    jnp.concatenate([gid, V[2 + s, :][None, :]], axis=0),
                    onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [2, 2*CHUNK]
                # Pad lanes hold (0, +inf); overwrite exactly the routed
                # lanes (one-term sums — adding would corrupt depth inf).
                taken = jnp.max(onehot, axis=1)[None, :] > 0.0
                staging[s] = jnp.where(taken, routed, staging[s])

            cur2 = cur + cnt_s
            do_flush = (cur2 >= CHUNK) & (dw < lim_ref[sp * S + s])

            @pl.when(do_flush)
            def _(s=s, dw=dw):
                flush(s, dw)
            cur2 = jnp.where(cur2 >= CHUNK, cur2 - CHUNK, cur2)
            new_cursors.append(cur2)
            new_dwins.append(jnp.where(do_flush, dw + 1, dw))
        return tuple(new_state) + tuple(new_cursors) + tuple(new_dwins)

    def cond(state):
        return state[0] < w1

    state0 = ((w0,) + tuple(jnp.int32(0) for _ in range(S))
              + tuple(base_ref[sp * S + s] for s in range(S)))
    fin = jax.lax.while_loop(cond, body, state0)

    # Residual flushes (cursor in [1, CHUNK-1]; upper staging half is pad).
    for s in range(S):
        cur = fin[1 + s]
        dw = fin[1 + S + s]

        @pl.when((cur > 0) & (dw < lim_ref[sp * S + s]))
        def _(s=s, dw=dw):
            flush(s, dw)

    @pl.when(sp == pl.num_programs(0) - 1)
    def _():
        for i in range(_N_WBUF):
            wait_write(i)


def compact_streams(vals: jnp.ndarray, seg_ws: jnp.ndarray,
                    seg_we: jnp.ndarray, base_w: jnp.ndarray,
                    flat_capacity: int, n_streams: int,
                    lim_w: jnp.ndarray | None = None) -> jnp.ndarray:
    """vals: [nws, R, CHUNK] window-major channel rows (R 8-aligned; row 0
    gid as exact f32 ints, row 1 membership bits, rows 2..2+n_streams the
    per-stream depths). seg_ws/seg_we: [n_seg] window ranges per segment.
    base_w: [n_seg * n_streams] int32 first OUTPUT window per stream in
    (segment, stream) order — callers compute it from the exclusive cumsum
    of CHUNK-padded per-stream counts. lim_w (same shape): one-past-last
    output window per stream; None = bounded by flat_capacity only.
    Returns [2, flat_capacity]: row 0 gid, row 1 depth; slots never
    written carry (0, +inf)."""
    import functools as _ft
    nws, r, ch = vals.shape
    assert ch == CHUNK and r % 8 == 0 and r >= 2 + n_streams
    assert flat_capacity % CHUNK == 0
    n_seg = seg_ws.shape[0]
    cap_w = flat_capacity // CHUNK
    if lim_w is None:
        lim_w = jnp.full(base_w.shape, cap_w, jnp.int32)
    else:
        lim_w = jnp.minimum(lim_w, cap_w).astype(jnp.int32)

    donor = jnp.concatenate([
        jnp.zeros((1, flat_capacity), jnp.float32),
        jnp.full((1, flat_capacity), _FILL_DEPTH, jnp.float32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # vals stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # donor
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_N_DBUF, r, CHUNK), jnp.float32),
            pltpu.VMEM((n_streams, 2, 2 * CHUNK), jnp.float32),
            pltpu.VMEM((_N_WBUF, 2, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_DBUF,)),
            pltpu.SemaphoreType.DMA((_N_WBUF,)),
            pltpu.SMEM((1 + _N_WBUF,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _ft.partial(_kernel, n_streams=n_streams),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, flat_capacity), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # Donor index counts after the 4 scalar-prefetch operands:
        # vals, donor -> 5; aliased into the output.
        input_output_aliases={5: 0},
        interpret=tile_raster._should_interpret(),
    )(seg_ws, seg_we, base_w, lim_w, vals, donor)
