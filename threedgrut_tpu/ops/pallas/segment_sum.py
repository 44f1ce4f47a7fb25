"""Pallas TPU segmented row-sum over contiguous slot segments.

Backward half of the scatter-free sorted_gather (ops/sorted_gather.py): given
per-slot cotangent rows already reordered to EXPANSION order (each particle's
slots contiguous, [ends[p-1], ends[p])), reduce them to per-particle rows.

Replaces the XLA chain  stack([cap] x F) -> cumsum([cap, F]) -> boundary
row-gather([N, F])  — ~42 ms at cap=3.4M on a v5e chip, dominated by the
1M-row gather's per-row dispatch — with one sequential-grid Pallas pass
(~11 ms): the grid walks 256-particle output blocks, each DMA-ing the
[F, 256]-slot windows its segments overlap (channel-major so every DMA is a
single aligned (16, 256) f32 block) and reducing them on the MXU with a
segment-membership one-hot matmul:

    out[p, :] += onehot[p, s] @ window[:, s]^T,
    onehot[p, s] = (global_slot(s) >= start_p) & (< end_p)

Membership masking makes boundary windows shared by consecutive blocks safe
to read twice — there is no carry, so the result is independent of the
block/window decomposition. f32 sums ride the MXU at HIGHEST precision
(3-term bf16 split), which reassociates the reduction: bounded ~1e-7
relative vs a sequential f32 sum (same class of error as any parallel scan).

Role in the parity map: the reference's per-particle gradient reduction is
warp-level atomicAdd in the CUDA backward (threedgut_tracer
gutRenderer.cu backward + splatRaster atomics); this pass is its
deterministic TPU replacement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Module-attr lookup (not a from-import) so tools/tpu_vs_cpu_check.py's
# per-device monkeypatch of tile_raster._should_interpret applies here too.
from threedgrut_tpu.ops.pallas import tile_raster

PBLK = 256   # particles per output block
SBLK = 256   # slots per input window


def _kernel_by_ids(wlo_ref, g_hbm, out_ref, dbuf, sem, *, precision, f):
    """Membership from the id row instead of per-particle bounds: g_hbm is
    [F_pad, cap] with the SORTED particle id (exact f32 integers) as row F
    (rows beyond are alignment padding — Mosaic requires 8-sublane-aligned
    DMA slices); block i owns particles [i*PBLK, (i+1)*PBLK) and its window
    range comes from ~cap/PBLK searchsorted probes instead of a [N]-ends
    vector — the fused walked-compaction backward's variant (computing
    dense ends for a compacted subset costs a (cap+N)-row sort, measured
    26 ms at bench shapes; the block probes are ~1 ms)."""
    i = pl.program_id(0)
    w_lo = wlo_ref[i]
    w_hi = wlo_ref[i + pl.num_programs(0)]

    def dma(w, slot):
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(w * SBLK, SBLK)], dbuf.at[slot], sem.at[slot])

    @pl.when(w_lo <= w_hi)
    def _():
        dma(w_lo, w_lo % 2).start()

    p0 = i * PBLK

    def body(state):
        w, acc = state
        slot = w % 2
        dma(w, slot).wait()

        @pl.when(w + 1 <= w_hi)
        def _():
            dma(w + 1, (w + 1) % 2).start()

        g_win = dbuf[slot][:f]                       # [F, SBLK]
        ids = dbuf[slot][f, :][None, :]              # [1, SBLK] f32 ids
        pl_iota = jax.lax.broadcasted_iota(jnp.int32, (PBLK, 1), 0)
        member = (ids == (pl_iota + p0).astype(jnp.float32)
                  ).astype(jnp.float32)              # [PBLK, SBLK]
        acc = acc + jax.lax.dot_general(
            g_win, member, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                      # [F, PBLK]
        return w + 1, acc

    def cond(state):
        w, _ = state
        return w <= w_hi

    _, acc = jax.lax.while_loop(
        cond, body, (w_lo, jnp.zeros((f, PBLK), jnp.float32)))
    out_ref[...] = acc


def segment_sum_rows_by_ids(g_cm: jnp.ndarray, ids_sorted: jnp.ndarray,
                            n: int, bf16_values: bool = False) -> jnp.ndarray:
    """Like segment_sum_rows, but segments come from the SORTED id column
    itself: g_cm [F, cap] channel-major rows already stably sorted by
    particle id, ids_sorted [cap] int32 that sort (rows with id >= n are
    ignored). Returns [F, n] per-particle sums, channel-major (layout note
    in segment_sum_rows). n and cap must be multiples of 256; ids must fit
    f32 integers (< 2^24 — the isect-capacity packing ceiling already
    enforces this)."""
    import functools as _ft
    f, cap = g_cm.shape
    assert cap % SBLK == 0 and n % PBLK == 0, (cap, n)
    n_blocks = n // PBLK

    # Per-block window range from block-boundary probes: ~n/PBLK binary-
    # search queries over the sorted ids (the default searchsorted method —
    # ~log2(cap) rounds of (n/PBLK)-row gathers, ~1 ms; method="sort" here
    # would re-pay the (cap+n) bitonic this kernel exists to avoid).
    q = jnp.arange(0, n + 1, PBLK, dtype=jnp.int32)
    pos = jnp.searchsorted(ids_sorted, q, side="left").astype(jnp.int32)
    blk_start, blk_end = pos[:-1], pos[1:]
    w_lo = (blk_start // SBLK).astype(jnp.int32)
    w_hi = jnp.where(blk_end > blk_start, (blk_end - 1) // SBLK,
                     w_lo - 1).astype(jnp.int32)
    w_bounds = jnp.concatenate([w_lo, w_hi])

    f_pad = -(-(f + 1) // 8) * 8
    g_ext = jnp.concatenate(
        [g_cm, ids_sorted.astype(jnp.float32)[None, :],
         jnp.zeros((f_pad - f - 1, cap), jnp.float32)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((f, PBLK), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, SBLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prec = (jax.lax.Precision.DEFAULT if bf16_values
            else jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        _ft.partial(_kernel_by_ids, precision=prec, f=f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=tile_raster._should_interpret(),
    )(w_bounds, g_ext)


def _kernel(wlo_ref, bounds_hbm, g_hbm, out_ref, dbuf, sbuf, sem, ssem, *,
            precision):
    i = pl.program_id(0)
    w_lo = wlo_ref[i]
    w_hi = wlo_ref[i + pl.num_programs(0)]   # packed [lo | hi] array

    # Segment bounds for this particle block, packed [n_blocks, 2, PBLK] so
    # the per-step DMA slices only the untiled leading dim (BlockSpec cannot
    # express a 1-sublane block, and int32 tiling rejects 1-row slices).
    b0 = pltpu.make_async_copy(bounds_hbm.at[i], sbuf, ssem)
    b0.start()

    def dma(w, slot):
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(w * SBLK, SBLK)], dbuf.at[slot], sem.at[slot])

    @pl.when(w_lo <= w_hi)
    def _():
        dma(w_lo, w_lo % 2).start()
    b0.wait()
    starts = sbuf[0][:, None]            # [PBLK, 1]
    ends_b = sbuf[1][:, None]

    def body(state):
        w, acc = state
        slot = w % 2
        dma(w, slot).wait()

        @pl.when(w + 1 <= w_hi)
        def _():
            dma(w + 1, (w + 1) % 2).start()

        g_win = dbuf[slot]                       # [F, SBLK]
        sg = (jax.lax.broadcasted_iota(jnp.int32, (1, SBLK), 1)
              + w * SBLK)                        # [1, SBLK] global slot ids
        member = ((sg >= starts) & (sg < ends_b)
                  ).astype(jnp.float32)          # [PBLK, SBLK]
        acc = acc + jax.lax.dot_general(
            g_win, member, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                  # [F, PBLK]
        return w + 1, acc

    def cond(state):
        w, _ = state
        return w <= w_hi

    f = out_ref.shape[0]
    _, acc = jax.lax.while_loop(
        cond, body, (w_lo, jnp.zeros((f, PBLK), jnp.float32)))
    out_ref[...] = acc


def segment_sum_rows(g_cm: jnp.ndarray, ends: jnp.ndarray,
                     bf16_values: bool = False) -> jnp.ndarray:
    """g_cm: [F, cap] slot rows channel-major (expansion order); ends: [N]
    int32 inclusive-prefix segment ends (monotone; clipped to cap here).
    Returns [F, N] per-segment sums (CHANNEL-MAJOR: the custom call pins
    row-major {1,0} layouts on its buffers, and a [N, 16] row-major output
    would force XLA to pad 16 -> 128 lanes AND propagate {1,0} onto every
    downstream [N, 3]/[N, 16] gradient temp — measured 42.7x padding, a
    19.9 GB HBM requirement at N = 2^20. With F minor-most the transpose
    back to [N, F] outside is a free bitcast into the {0,1} layout XLA
    prefers for small-minor-dim arrays). N, cap must be multiples of 256.
    """
    # With `bf16_values` the caller guarantees every g_cm entry is exactly
    # bf16-representable (the bf16 cotangent-reorder leg unpacks to such
    # values): the DEFAULT-precision MXU pass is then BITWISE identical to
    # HIGHEST (the 3-term split's lo terms are exactly zero) at 1/3 the
    # passes.
    import functools as _ft
    f, cap = g_cm.shape
    n = ends.shape[0]
    assert cap % SBLK == 0 and n % PBLK == 0, (cap, n)
    n_blocks = n // PBLK

    e = jnp.minimum(ends, cap).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), e[:-1]])

    # Per-block window range over the slots its segments cover. Empty blocks
    # (start == end for every particle) get lo > hi and skip the loop.
    blk_start = starts[::PBLK]                    # [n_blocks] first start
    blk_end = e[PBLK - 1::PBLK]                   # [n_blocks] last end
    w_lo = (blk_start // SBLK).astype(jnp.int32)
    w_hi = jnp.where(blk_end > blk_start, (blk_end - 1) // SBLK,
                     w_lo - 1).astype(jnp.int32)
    w_bounds = jnp.concatenate([w_lo, w_hi])      # packed [2 * n_blocks]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # bounds in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # g stays in HBM
        ],
        out_specs=pl.BlockSpec((f, PBLK), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, f, SBLK), jnp.float32),
            pltpu.VMEM((2, PBLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    bounds = jnp.stack([starts.reshape(n_blocks, PBLK),
                        e.reshape(n_blocks, PBLK)], axis=1)
    prec = (jax.lax.Precision.DEFAULT if bf16_values
            else jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        _ft.partial(_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=tile_raster._should_interpret(),
    )(w_bounds, bounds, g_cm)
