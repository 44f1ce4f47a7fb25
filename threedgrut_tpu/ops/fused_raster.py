"""Fused gather -> tile compositor with a walked-window-compacted backward.

The default 3DGUT pipeline composes two custom_vjps: sorted_gather (gather
packed particle rows into sorted-slot order; backward = stable id-sort +
segment sum over ALL isect_capacity slots) and tile_raster.tile_composite
(the Pallas walk). But the kernel walk EARLY-EXITS once every pixel of a
tile is saturated — the census at bench scale says only 46.4% of the slot
range is ever walked — and the backward kernel's output is donated
pre-zeroed, so the cotangent rows of never-walked windows are exactly zero.
The separate sorted_gather VJP cannot know that (the walk extents are a
kernel output downstream of the gather), so it pays the dominant unsort
sort + segment sum over the full capacity, half of it zeros.

This op spans both stages in ONE custom_vjp so the backward can read the
forward kernel's per-tile walked extents (free diagnostics in output row 7,
tile_raster._forward_kernel) and compact the cotangent windows to a static
`walk_capacity` before the unsort:

  * walked slots form a PREFIX of each tile's contiguous slot range
    (front-to-back termination), so the union of walked windows is a set of
    CHUNK-aligned intervals — compactable at window granularity with one
    tiny [W]-row sort and one [Wc]-row window gather (no per-slot dispatch,
    the trap every per-slot exploitation of the never-walked census hits —
    see PARITY.md's negative results).
  * the per-particle segment ends of the compacted subset are recomputed
    with one sort-based searchsorted; removing exactly-zero rows from the
    f32 segment sums leaves them unchanged up to the reassociation the
    Pallas reduction already has.
  * if the walked-window count exceeds walk_capacity (a static bound; the
    trainer sizes it as a fraction of isect_capacity), a lax.cond falls
    back to the full-capacity unsort — gradients are EXACT either way, the
    bound only decides which sort runs.

Reference role: the CUDA backward (gutRenderer.cu:413-417) replays the
forward's sorted tile buffers per tile and atomically accumulates into
per-particle gradients, so it never touches unwalked slots either; this is
the bulk-synchronous analogue of that property.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.ops.sorted_gather import unsort_segment_sum

_N_STATIC = 12  # trailing static args (see nondiff_argnums below)


def walked_window_mask(out, tile_starts, nw):
    """Walked-window coverage from the forward's per-tile walked-slot counts
    (output row 7 — free diagnostics; exact f32 integers, capacities clamp
    at 2^24). Tile t walked slots [start_t, start_t + walked_t), so its
    windows are [start_t // CHUNK, (start_t + walked_t - 1) // CHUNK]; the
    union over the (slot-ordered) tiles falls out of one scatter-max +
    cummax, the same segment-fill trick as grt.flatten_candidates. Returns
    ([nw] bool mask, [] int32 count)."""
    ch = tile_raster.CHUNK
    walked = out[:, 7, 0].astype(jnp.int32)           # [num_tiles]
    has = walked > 0
    wlo = jnp.where(has, tile_starts // ch, 0)
    whi = jnp.where(has, (tile_starts + walked - 1) // ch, -1)
    cover = jax.lax.cummax(jnp.full((nw,), -1, jnp.int32).at[wlo].max(whi))
    wmask = cover >= jnp.arange(nw, dtype=jnp.int32)
    return wmask, jnp.sum(wmask.astype(jnp.int32))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=tuple(range(6, 6 + _N_STATIC)))
def composite_particles(
    packed,             # [N, 16] packed particle rows (differentiable)
    sorted_idx,         # [cap] int32 particle id per slot (tail rows: N)
    particle_ends,      # [N] int32 cumsum of per-particle slot counts
    tile_starts,        # [num_tiles] int32
    tile_ends,          # [num_tiles] int32
    rays,               # [num_tiles, 8, 256]
    degree: int,
    min_transmittance: float,
    min_response: float = C.MIN_KERNEL_RESPONSE,
    min_alpha: float = C.MIN_ALPHA,
    max_alpha: float = C.MAX_ALPHA,
    sorted_passes: int = 0,
    has_t_max: bool = True,
    aux_grads: bool = True,
    aux_outputs: bool = True,
    lowprec_grads: bool = False,
    row_termination: bool = False,
    walk_capacity: int = 0,
):
    """tile_composite(packed[sorted_idx], ...) with the compacted backward.

    Forward output and semantics are identical to the two-stage path
    (gut.prepare + tile_raster.tile_composite); `walk_capacity` (multiple of
    256, < cap) bounds the compacted unsort — callers size it from the
    walked-fraction census (~0.5-0.65 of isect_capacity at converged
    scenes) and rely on the exact dense fallback above it."""
    data_sorted = packed[sorted_idx]
    return tile_raster._forward(
        data_sorted, tile_starts, tile_ends, rays, degree, min_transmittance,
        min_response, min_alpha, max_alpha, sorted_passes, has_t_max,
        aux_outputs, row_termination=row_termination)


def _fwd(packed, sorted_idx, particle_ends, tile_starts, tile_ends, rays,
         degree, min_transmittance, min_response, min_alpha, max_alpha,
         sorted_passes, has_t_max, aux_grads, aux_outputs, lowprec_grads,
         row_termination, walk_capacity):
    data_sorted = packed[sorted_idx]
    out = tile_raster._forward(
        data_sorted, tile_starts, tile_ends, rays, degree, min_transmittance,
        min_response, min_alpha, max_alpha, sorted_passes, has_t_max,
        aux_outputs, row_termination=row_termination)
    return out, (packed.shape[0], sorted_idx, particle_ends, data_sorted,
                 tile_starts, tile_ends, rays, out)


def _bwd(degree, min_transmittance, min_response, min_alpha, max_alpha,
         sorted_passes, has_t_max, aux_grads, aux_outputs, lowprec_grads,
         row_termination, walk_capacity, res, g_out):
    (n, sorted_idx, particle_ends, data_sorted, tile_starts, tile_ends, rays,
     out) = res
    cap = data_sorted.shape[0]
    ch = tile_raster.CHUNK
    assert walk_capacity % 256 == 0 and 0 < walk_capacity < cap, walk_capacity
    # Row-7 walked counts and the by-ids filler id ride f32 channels — exact
    # integers only below 2^24 (same ceiling the grt compact_kernel asserts).
    assert cap <= (1 << 24) and n <= (1 << 24), (cap, n)
    # CHUNK is env-overridable (TILE_RASTER_CHUNK); the // ch floor below must
    # not silently shrink the configured compaction bound.
    assert walk_capacity % ch == 0, (walk_capacity, ch)
    nw = cap // ch
    wc = walk_capacity // ch

    g_windows = tile_raster._backward_windows(
        data_sorted, tile_starts, tile_ends, rays, out, g_out, degree=degree,
        min_transmittance=min_transmittance, min_response=min_response,
        min_alpha=min_alpha, max_alpha=max_alpha, sorted_passes=sorted_passes,
        has_t_max=has_t_max, aux_grads=aux_grads,
        lowprec_grads=lowprec_grads,
        row_termination=row_termination)              # [nw, ROW_F, CHUNK]

    wmask, cnt = walked_window_mask(out, tile_starts, nw)
    ids_windows = sorted_idx.reshape(nw, ch)
    precision = "bf16" if lowprec_grads else "f32"

    def compact(gw):
        # Stable compaction of the walked window ids: j-th selected window
        # = first w with cumsum(wmask)[w] == j+1, via a binary-search
        # searchsorted (~log2(nw) rounds of [wc]-row gathers; a [nw]-element
        # 2-op sort here measured 3.5 ms — bitonic STAGE COUNT is
        # launch-bound regardless of how tiny the array is). Tail rows past
        # cnt clamp onto the last window, so their ids are fillered to n —
        # filler rows sort past every real segment and land in no output
        # block (segment_sum_rows_by_ids).
        csum = jnp.cumsum(wmask.astype(jnp.int32))
        wsel = jnp.searchsorted(
            csum, jnp.arange(1, wc + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        wsel = jnp.minimum(wsel, nw - 1)
        vsel = jnp.arange(wc, dtype=jnp.int32) < cnt
        ids_c = jnp.where(vsel[:, None], ids_windows[wsel],
                          n).reshape(wc * ch)
        g_c = gw[wsel]                                # [wc, ROW_F, CHUNK]
        cols = [g_c[:, i, :].reshape(wc * ch)
                for i in range(tile_raster.ROW_F)]
        # ends=None: the compacted subset's segments come from the sorted
        # id column itself (segment_sum_rows_by_ids) — no ends vector.
        return unsort_segment_sum(ids_c, cols, n, ends=None,
                                  grad_precision=precision)

    def dense(gw):
        g_rows = tile_raster._from_windows(gw)
        return unsort_segment_sum(
            sorted_idx, [g_rows[:, i] for i in range(tile_raster.ROW_F)],
            n, ends=particle_ends, grad_precision=precision)

    d_packed = jax.lax.cond(cnt <= wc, compact, dense, g_windows)
    return d_packed, None, None, None, None, None


composite_particles.defvjp(_fwd, _bwd)


# ---- 3DGRT bundle analogue --------------------------------------------------

_N_STATIC_B = 8


@functools.partial(
    jax.custom_vjp, nondiff_argnums=tuple(range(6, 6 + _N_STATIC_B)))
def composite_bundles(
    rows64,             # [N, 64] packed candidate rows (differentiable)
    flat_idx,           # [capF] int32 particle id per flat slot
    valid,              # [capF] bool intra-segment padding mask
    rays,               # [nb, 8, 256]
    win_starts,         # [nb] int32 first window of each bundle
    win_ends,           # [nb] int32 one-past-last window
    degree: int,
    sh_degree: int,
    min_transmittance: float,
    min_response: float = C.MIN_KERNEL_RESPONSE,
    min_alpha: float = C.MIN_ALPHA,
    max_alpha: float = C.MAX_ALPHA,
    sorted_passes: int = 0,
    walk_capacity: int = 0,
):
    """bundle_composite(rows64[flat_idx] w/ masked opacity) with the
    walked-window-compacted backward — the 3DGRT-path twin of
    composite_particles (bundle window ranges are already disjoint and
    CHUNK-aligned, so the walked union is exactly the per-bundle walked
    prefixes from output row 7). The wide 64-channel cotangents keep the
    argsort+row-gather transpose (unsort_gather_segment_sum — a payload
    sort loses at this width, RESULTS.md), so the compaction shrinks the
    row-dispatch-bound gather and the segment sum."""
    from threedgrut_tpu.ops.pallas import bundle_trace
    d = rows64[flat_idx]
    d = d.at[:, 12].multiply(valid.astype(d.dtype))
    return bundle_trace._forward(
        d, rays, win_starts, win_ends, degree, sh_degree, min_transmittance,
        min_response, min_alpha, max_alpha, sorted_passes)


def _bfwd(rows64, flat_idx, valid, rays, win_starts, win_ends, degree,
          sh_degree, min_transmittance, min_response, min_alpha, max_alpha,
          sorted_passes, walk_capacity):
    from threedgrut_tpu.ops.pallas import bundle_trace
    d = rows64[flat_idx]
    d = d.at[:, 12].multiply(valid.astype(d.dtype))
    out = bundle_trace._forward(
        d, rays, win_starts, win_ends, degree, sh_degree, min_transmittance,
        min_response, min_alpha, max_alpha, sorted_passes)
    return out, (rows64.shape[0], flat_idx, valid, d, rays, win_starts,
                 win_ends, out)


def _bbwd(degree, sh_degree, min_transmittance, min_response, min_alpha,
          max_alpha, sorted_passes, walk_capacity, res, g_out):
    from threedgrut_tpu.ops.pallas import bundle_trace
    from threedgrut_tpu.ops.sorted_gather import unsort_gather_segment_sum
    (n, flat_idx, valid, d, rays, win_starts, win_ends, out) = res
    capF = d.shape[0]
    ch = bundle_trace.CHUNK
    assert walk_capacity % 256 == 0 and 0 < walk_capacity < capF
    assert capF <= (1 << 24) and n <= (1 << 24), (capF, n)
    assert walk_capacity % ch == 0, (walk_capacity, ch)
    nw = capF // ch
    wc = walk_capacity // ch

    g_windows = bundle_trace._backward_windows(
        d, rays, win_starts, win_ends, out, g_out, degree=degree,
        sh_degree=sh_degree, min_transmittance=min_transmittance,
        min_response=min_response, min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes)                   # [nw, 64, CHUNK]

    # Bundle b walked windows [win_starts[b], win_starts[b] + walked_b)
    # (forward row-7 diagnostics); ranges are disjoint and ordered, so the
    # same scatter-max + cummax union as the tile path applies.
    walked = out[:, 7, 0].astype(jnp.int32)           # [nb] windows walked
    has = walked > 0
    wlo = jnp.where(has, win_starts, 0)
    whi = jnp.where(has, win_starts + walked - 1, -1)
    cover = jax.lax.cummax(jnp.full((nw,), -1, jnp.int32).at[wlo].max(whi))
    wmask = cover >= jnp.arange(nw, dtype=jnp.int32)
    cnt = jnp.sum(wmask.astype(jnp.int32))
    idx_w = flat_idx.reshape(nw, ch)
    val_w = valid.reshape(nw, ch)

    def compact(gw):
        # Same searchsorted compaction + filler-id masking as the tile
        # path's compact branch (see composite_particles._bwd).
        csum = jnp.cumsum(wmask.astype(jnp.int32))
        wsel = jnp.searchsorted(
            csum, jnp.arange(1, wc + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        wsel = jnp.minimum(wsel, nw - 1)
        vsel = jnp.arange(wc, dtype=jnp.int32) < cnt
        ids_c = jnp.where(vsel[:, None], idx_w[wsel], n).reshape(wc * ch)
        val_c = val_w[wsel].reshape(wc * ch)
        g_c = gw[wsel].transpose(0, 2, 1).reshape(wc * ch, 64)
        g_c = g_c.at[:, 12].multiply(val_c.astype(g_c.dtype))
        return unsort_gather_segment_sum(ids_c, g_c, n)

    def dense(gw):
        g_rows = gw.transpose(0, 2, 1).reshape(capF, 64)
        g_rows = g_rows.at[:, 12].multiply(valid.astype(g_rows.dtype))
        return unsort_gather_segment_sum(flat_idx, g_rows, n)

    d_rows = jax.lax.cond(cnt <= wc, compact, dense, g_windows)
    return d_rows, None, None, None, None, None


composite_bundles.defvjp(_bfwd, _bbwd)
