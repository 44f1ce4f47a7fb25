"""Pallas TPU tile compositor: the 3DGUT hot loop, forward and backward.

TPU-native design (replaces gutKBufferRenderer.cuh + gutRenderer.cu render
stage — cooperative shared-memory prefetch, warp ballots, atomics):

  * Grid over 16x16 pixel tiles, executed sequentially ("arbitrary"), one
    program per tile.
  * The depth-sorted particle list lives in HBM as CHUNK-aligned windows in
    struct-of-arrays layout [W, ROW_F, CHUNK] (fields x particles), so every
    DMA moves full (16, 256) f32 blocks — Mosaic-tileable (sublane 8 | lane
    128 aligned), no unaligned slicing. A tile walks the windows overlapping
    its [start, end) range and masks rows outside it.
  * The per-ray sequential transmittance recurrence is reformulated as an
    exclusive prefix sum of log(1 - alpha) computed by a strictly-lower-
    triangular ones matmul on the MXU — no sequential per-hit loop, no warp
    primitives.
  * Per-particle gradients are written densely per sorted slot (no atomics)
    and segment-summed outside by an XLA scatter-add — bitwise deterministic.
    Boundary windows shared by consecutive tiles are handled with
    read-modify-write, which is race-free because the grid is sequential.

The per-(ray, particle) alpha is the exact 3D ray-space response of
ops/particles.py, evaluated from a packed per-particle row:
  row = [A (9: world->canonical including 1/scale), mean (3), opacity (1),
         rgb color (3)]  (16 floats)
with u = A (o - mean), v = A d:
  grayDist = |v x u|^2 / |v|^2 ;  alpha = min(0.99, opacity * resp(grayDist))
  hitT = |v . u| / |v|^2  (the reference's scaled projection distance, for
  unit-norm world ray directions).

Rays are packed per tile as [num_tiles, 8, 256]: rows 0-2 origin xyz,
rows 3-5 direction xyz (unit norm), row 6 per-ray t_max (<= 0 means
unbounded; used by the hybrid renderer to stop at mesh hits), row 7 padding.
Forward output is [num_tiles, 8, 256]: rows 0-2 rgb, 3 opacity, 4 depth,
5 transmittance, 6 hit count, 7 padding.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedgrut_tpu import constants as C

import os as _os
# 128 measured ~9% faster than 256 at 1M Gaussians / 800x800 on v5e: less
# boundary-row waste per tile range and one fewer prefix-ladder pass. 64 is
# impossible (Mosaic requires 128-lane-aligned DMA slices).
CHUNK = int(_os.environ.get("TILE_RASTER_CHUNK", "128"))  # rows per window
PIX = C.TILE_SIZE    # 256 pixels per tile
ROW_F = 16           # packed floats per particle
# Data-window prefetch depth: PF windows in flight while one is computed
# (ring of PF+1 VMEM buffers). 2+ hides the per-window DMA issue latency
# behind compute when a window's math is shorter than a DMA round trip.
PREFETCH = max(1, int(_os.environ.get("TILE_RASTER_PREFETCH", "2")))
_N_DBUF = PREFETCH + 1
# Windows per DMA group: consecutive windows are contiguous in the HBM
# [W, ROW_F, CHUNK] layout, so one DMA fetches GROUP windows and the inner
# per-window compute unrolls statically. MEASURED SLOWER at 2 (36.6 vs 31.8
# ms fwd at 1M Gaussians): the per-window cost is fixed compute, not loop/
# DMA overhead, and grouping adds boundary-window waste — keep 1; the knob
# remains for probing. isect capacities are multiples of 256 = 2 * CHUNK,
# so GROUP=2 always divides the window count when probing.
GROUP = max(1, int(_os.environ.get("TILE_RASTER_GROUP", "1")))
# Pair-math formulation for u = A(o-p), v = Ad (and the backward's qj):
# "vpu" broadcast outer products (default) vs "mxu" k=3 HIGHEST matmuls.
_PAIR_MXU = _os.environ.get("TILE_RASTER_PAIR", "vpu") == "mxu"
# Lane compaction: once <= 128 pixels of a tile are unsaturated, compact
# them into half-width [CHUNK, 128] windows (exact one-hot MXU routing).
# BUILT AND MEASURED NET-NEGATIVE at bench scale (r4): the census says only
# 19.2% of walked slots run at <= 128 alive (tools/bench_stages.py lanes),
# the tail window's cost does not halve (DMA + loop overheads are
# lane-count-independent), and the two-loop structure itself costs ~2.5 ms
# fwd / ~5 ms fwd+bwd (24.2/93.7 vs 21.6/88.4 ms with the knob off, TPU
# v5e, 1M Gaussians) — the same conclusion as r3's row-termination probe:
# per-pixel termination does not pay on TPU vector hardware at this scene.
# Default OFF; the machinery stays correct (bit-exact forward, 1e-12-rel
# backward, tests) for probing other scenes.
_LANE_COMPACT = _os.environ.get("TILE_RASTER_LANEC", "0") == "1"
_HALF = PIX // 2


def _response_and_grad_coeff(g: jnp.ndarray, degree: int):
    """Kernel response r(g) and dr/dg for static degree (g = grayDist)."""
    s = C.GG_SCALE[degree]
    if degree == 0:
        sq = jnp.sqrt(jnp.maximum(g, 1e-12))
        r = jnp.maximum(1.0 + s * sq, 0.0)
        dr = jnp.where(r > 0.0, 0.5 * s / sq, 0.0)
        return r, dr
    if degree == 1:
        sq = jnp.sqrt(jnp.maximum(g, 1e-12))
        r = jnp.exp(s * sq)
        return r, r * s * 0.5 / sq
    if degree == 2:
        r = jnp.exp(s * g)
        return r, r * s
    if degree == 3:
        sq = jnp.sqrt(jnp.maximum(g, 1e-12))
        r = jnp.exp(s * g * sq)
        return r, r * s * 1.5 * sq
    if degree == 4:
        r = jnp.exp(s * g * g)
        return r, r * s * 2.0 * g
    if degree == 5:
        sq = jnp.sqrt(jnp.maximum(g, 1e-12))
        r = jnp.exp(s * g * g * sq)
        return r, r * s * 2.5 * g * sq
    if degree == 8:
        g2 = g * g
        r = jnp.exp(s * g2 * g2)
        return r, r * s * 4.0 * g2 * g
    raise ValueError(f"unsupported kernel degree {degree}")


def _pair_quantities(S, rays, degree, need_hit_t=True, has_t_max=True):
    """Shared forward math for one window.

    S: [ROW_F, CHUNK] packed fields-x-particles; rays: [8, PIX] block.
    Returns dict of [CHUNK, PIX] (and [CHUNK, 1]) arrays.

    `need_hit_t=False` skips the projection-distance chain (7 VPU passes) —
    valid only when the caller consumes neither hit_t nor in_segment (the
    backward kernel with aux_grads=False, unsorted, unbounded rays).
    `has_t_max=False` skips the per-ray segment test (rays row 6 all <= 0).
    """
    def comp(i):
        return S[i, :][:, None]  # [CHUNK, 1]

    o = [rays[i, :][None, :] for i in range(3)]   # [1, PIX] each
    d = [rays[3 + i, :][None, :] for i in range(3)]
    p = [comp(9 + i) for i in range(3)]
    w0 = [o[i] - p[i] for i in range(3)]          # o - mean: [CHUNK, PIX]
    a = [comp(i) for i in range(9)]               # A row-major
    # u_r = A_r . (o - p);  v_r = A_r . d.
    if _PAIR_MXU:
        # k=3 matmuls on the MXU. At HIGHEST precision each forces a 3-pass
        # f32 split for a contraction the MXU barely uses — measured SLOWER
        # than the VPU outer-product form below; kept for A/B probing
        # (TILE_RASTER_PAIR=mxu).
        ao = [jax.lax.dot_general(
            S[3 * r:3 * r + 3, :], rays[0:3, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) for r in range(3)]
        ad = [jax.lax.dot_general(
            S[3 * r:3 * r + 3, :], rays[3:6, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) for r in range(3)]
        ap = [a[3 * r + 0] * p[0] + a[3 * r + 1] * p[1] + a[3 * r + 2] * p[2]
              for r in range(3)]                  # [CHUNK, 1]
        u = [ao[r] - ap[r] for r in range(3)]
        v = ad
    else:
        # VPU broadcast outer-product form: exact f32 (no bf16 split),
        # 5 passes per component.
        u = [a[3 * r + 0] * w0[0] + a[3 * r + 1] * w0[1]
             + a[3 * r + 2] * w0[2] for r in range(3)]
        v = [a[3 * r + 0] * d[0] + a[3 * r + 1] * d[1]
             + a[3 * r + 2] * d[2] for r in range(3)]
    cr = [v[1] * u[2] - v[2] * u[1],
          v[2] * u[0] - v[0] * u[2],
          v[0] * u[1] - v[1] * u[0]]              # v x u
    crsq = cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2]
    vsq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    # Zero-padded rows have v == 0; keep them NaN-free (they carry opacity 0
    # and are rejected, but 0 * inf would poison the accumulators).
    inv_vsq = 1.0 / jnp.maximum(vsq, 1e-24)
    g = crsq * inv_vsq
    resp, dresp_dg = _response_and_grad_coeff(g, degree)
    opacity = comp(12)
    alpha_raw = resp * opacity
    if need_hit_t:
        vdotu = v[0] * u[0] + v[1] * u[1] + v[2] * u[2]
        hit_t = jnp.abs(vdotu) * inv_vsq
    else:
        vdotu = hit_t = None
    if has_t_max:
        # Per-ray segment bound (row 6): t_max <= 0 means unbounded.
        tmax = rays[6, :][None, :]
        in_segment = (tmax <= 0.0) | (hit_t <= tmax)
    else:
        in_segment = True
    return dict(u=u, v=v, cr=cr, crsq=crsq, vsq=vsq, inv_vsq=inv_vsq, g=g,
                resp=resp, dresp_dg=dresp_dg, opacity=opacity,
                alpha_raw=alpha_raw, vdotu=vdotu, hit_t=hit_t, w0=w0, d=d,
                a=a, in_segment=in_segment)


def _alpha_from_raw(q, row_mask, min_response, min_alpha, max_alpha):
    alpha = jnp.minimum(q["alpha_raw"], max_alpha)
    accept = ((q["resp"] > min_response) & (alpha > min_alpha) & row_mask
              & q["in_segment"])
    return jnp.where(accept, alpha, 0.0), accept


def _shift_fill(y, s, fill):
    """y shifted down s rows, top s rows = fill. For sublane-aligned s
    (multiple of 8) a static concat does it in one copy; otherwise mask a
    cyclic roll (2 passes)."""
    if s % 8 == 0:
        return jnp.concatenate(
            [jnp.full((s,) + y.shape[1:], fill, y.dtype), y[: y.shape[0] - s]],
            axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1), 0)
    return jnp.where(row >= s, pltpu.roll(y, s, axis=0), fill)


def _prefix_inclusive(x):
    """[CHUNK, PIX] -> inclusive prefix sum along the chunk axis.

    Hillis-Steele with sublane shifts: log2(CHUNK) shifted adds on the VPU —
    exact f32 (a bf16 MXU triangular matmul visibly corrupts transmittance,
    and HIGHEST-precision matmul costs 6 passes)."""
    y = x
    s = 1
    while s < CHUNK:
        y = y + _shift_fill(y, s, 0.0)
        s *= 2
    return y


def _prefix_prod(x):
    """[CHUNK, PIX] -> (exclusive, total) prefix PRODUCT along the chunk
    axis. Same Hillis-Steele ladder with multiplies — replaces the former
    log1p/cumsum/exp round trip for transmittance (two transcendental
    [CHUNK, PIX] arrays per window) with log2(CHUNK) shifted multiplies; f32
    products of (1 - alpha) are the reference renderers' own accumulation
    form."""
    y = x
    s = 1
    while s < CHUNK:
        y = y * _shift_fill(y, s, 1.0)
        s *= 2
    return _shift_fill(y, 1, 1.0), y[CHUNK - 1:CHUNK, :]


def _tri_matmuls(x, strict_lower: bool):
    """Prefix sums along the chunk axis (name kept from the MXU variant)."""
    incl = _prefix_inclusive(x)
    return incl - x if strict_lower else incl


def _row_mask(w, start, end):
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + w * CHUNK
    return (row_idx >= start) & (row_idx < end)


# ---- per-ray windowed re-sort ("sorted" k-buffer mode) --------------------
#
# The reference's sorted configs re-sort approximately-ordered hits per ray
# in a k=16 register buffer (gutKBufferRenderer.cuh:28-85, HitParticleKBuffer
# insert/flush; configs/paper/3dgut/base_sorted.yaml). TPU-native analogue:
# P passes of odd-even transposition over each 256-hit window, applied PER
# RAY (keys are the per-ray 3D hit distances) — exact whenever per-ray
# inversions against the global depth order span <= P positions inside a
# window (the reference's buffer makes the same bounded-displacement
# assumption at k=16; a 256-wide window resort is stronger except exactly at
# window boundaries). Only the transmittance/suffix prefix sums depend on
# order, so the pair math stays in original row layout: we sort (1-alpha)
# with the keys, prefix-multiply in sorted order, map the result back via the
# recorded swap masks (one bit per pass, packed in an int32 lane — the
# network is an involution per pass given its mask).


def _adaptive_sort() -> int:
    """Convergence-gated odd-even passes (r5, VERDICT #5): windows that
    need fewer than the configured pass budget skip the rest under scalar
    lax.conds, checked every `block` passes (two consecutive quiet passes
    == fully sorted, so skipping is EXACT — identical masks and output).

    TILE_RASTER_ADAPTIVE_SORT sets the check block size; 0 (DEFAULT)
    disables — the unconditional static network. MEASURED NET-NEGATIVE at
    both bench scenes (RESULTS.md r5): 1M sorted bench 402.7 ms per-pass
    gate / 351.7 block-4 / 331.7 static; 3DGRT 100k (sorted-16 kernel)
    133.2 / 125.7 / 119.7. One straggler ray per 256-lane window keeps the
    network busy, so windows essentially never go quiet within the pass
    budget on converged scenes — the same verdict as every per-pixel
    termination variant (PARITY.md). Kept as an opt-in for genuinely
    near-sorted workloads."""
    import os
    return int(os.environ.get("TILE_RASTER_ADAPTIVE_SORT", "0"))


def _oddeven_sort(key, vals, passes):
    """Return (vals sorted by key per lane, (swap-mask bits [CHUNK, PIX],
    used pass count [] int32))."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    masks = jnp.zeros(key.shape, jnp.int32)
    block = _adaptive_sort()
    used = jnp.int32(passes)
    done = jnp.bool_(False)

    def pass_block(op, lo, hi):
        """Passes [lo, hi) unconditionally; returns swap-activity count of
        the last two passes (0 == fully sorted)."""
        key, vals, masks = op
        quiet2 = jnp.int32(0)
        for i in range(lo, hi):
            nxt_k = pltpu.roll(key, CHUNK - 1, axis=0)     # key[j+1] at row j
            here = ((row % 2 == (i % 2)) & (row < CHUNK - 1))
            swap_i = ((nxt_k < key) & here).astype(jnp.int32)
            up = (pltpu.roll(swap_i, 1, axis=0) == 1) & ~here  # row j+1
            swap = swap_i == 1
            prv_k = pltpu.roll(key, 1, axis=0)
            key = jnp.where(swap, nxt_k, jnp.where(up, prv_k, key))
            vals = tuple(
                jnp.where(swap, pltpu.roll(v, CHUNK - 1, axis=0),
                          jnp.where(up, pltpu.roll(v, 1, axis=0), v))
                for v in vals)
            masks = masks | (swap_i << i)
            if i >= hi - 2:
                quiet2 = quiet2 + jnp.sum(swap_i)
        return key, vals, masks, quiet2

    if block <= 0 or passes <= block:
        key, vals, masks, _ = pass_block((key, tuple(vals), masks), 0,
                                         passes)
        return list(vals), (masks, used)

    state = (key, tuple(vals), masks)
    for lo in range(0, passes, block):
        hi = min(lo + block, passes)

        def run_block(op, lo=lo, hi=hi):
            key, vals, masks, act = pass_block(op, lo, hi)
            return key, vals, masks, act

        def skip_block(op):
            return op[0], op[1], op[2], jnp.int32(0)

        if lo == 0:
            *state, act = run_block(state)
            state = tuple(state)
        else:
            *state, act = jax.lax.cond(done, skip_block, run_block, state)
            state = tuple(state)
        # Two quiet trailing passes == sorted; later blocks skip (EXACT:
        # they could only produce zero swaps, so masks match the static
        # network bit-for-bit). `used` = pass bound for _apply_swaps: the
        # first block that went quiet caps it (bits past it are zero).
        newly_done = (act == 0) & ~done
        used = jnp.where(newly_done, jnp.int32(hi), used)
        done = done | newly_done
    key, vals, masks = state
    return list(vals), (masks, used)


def _apply_swaps(masks, x, passes, inverse):
    """Apply (or invert) the recorded odd-even network to channel x.
    `masks` is _oddeven_sort's (bits, used) pair; passes >= used have no
    bits set (identity) and skip in blocks under the adaptive gate."""
    masks, used = masks
    block = _adaptive_sort()
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def apply_range(x, lo, hi):
        order = range(hi - 1, lo - 1, -1) if inverse else range(lo, hi)
        for i in order:
            here = ((row % 2 == (i % 2)) & (row < CHUNK - 1))
            swap_i = jnp.where(here, (masks >> i) & 1, 0)
            up = (pltpu.roll(swap_i, 1, axis=0) == 1) & ~here
            swap = swap_i == 1
            x = jnp.where(swap, pltpu.roll(x, CHUNK - 1, axis=0),
                          jnp.where(up, pltpu.roll(x, 1, axis=0), x))
        return x

    if block <= 0 or passes <= block:
        return apply_range(x, 0, passes)
    blocks = [(lo, min(lo + block, passes))
              for lo in range(0, passes, block)]
    if inverse:
        blocks = blocks[::-1]
    for lo, hi in blocks:
        if lo == 0:
            x = apply_range(x, lo, hi)
        else:
            x = jax.lax.cond(jnp.int32(lo) < used,
                             lambda x, lo=lo, hi=hi: apply_range(x, lo, hi),
                             lambda x: x, x)
    return x


def _t_before_excl(alpha, one_m, q, sorted_passes, row_idx=None, start=None,
                   end=None):
    """Exclusive transmittance-product prefix in compositing order, returned
    in ORIGINAL row order. sorted_passes == 0 is the global-depth (unsorted)
    mode. Also returns the swap masks (or None) for backward reuse."""
    if not sorted_passes:
        excl, _ = _prefix_prod(one_m)
        return excl, None
    # In-range rows keep their per-ray hit distance as the key — they are
    # already in global depth order, so displacements equal the true per-ray
    # inversion distances. Rows OUTSIDE [start, end) (neighbor tiles' slots
    # sharing the window, zero padding) are pinned in place with -/+inf so
    # they never consume transposition passes (they carry one_m == 1, their
    # position is irrelevant).
    key = q["hit_t"]
    if row_idx is not None:
        key = jnp.where(row_idx < start, jnp.float32(-3.4e38), key)
        key = jnp.where(row_idx >= end, jnp.float32(3.4e38), key)
    (one_m_s,), masks = _oddeven_sort(key, [one_m], sorted_passes)
    excl_s, _ = _prefix_prod(one_m_s)
    return _apply_swaps(masks, excl_s, sorted_passes, inverse=True), masks


def _lane_select(needed):
    """[PIX] bool (<= _HALF set) -> one-hot SelM [_HALF, PIX] routing the
    selected lanes to compact lanes in ascending order.

    Ranks come from one strictly-lower-triangular ones matmul (exact: 0/1
    inputs, integer sums < 2^8); the one-hot equality compare is a single
    VPU pass. Used by the lane-compaction tail (see _forward_kernel)."""
    nd = needed.astype(jnp.float32)[None, :]                   # [1, PIX]
    k = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 1)
    low = (k < j).astype(jnp.float32)
    r_excl = jax.lax.dot_general(
        nd, low, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [1, PIX]
    # Mosaic iota must be integer; r_excl is integer-valued f32 (< 2^8).
    i = jax.lax.broadcasted_iota(jnp.int32, (_HALF, PIX), 0)
    return jnp.where((i == r_excl.astype(jnp.int32)) & needed[None, :],
                     1.0, 0.0)


def _compact_lanes(x, selm):
    """[k, PIX] -> [k, _HALF] one-hot routing (exact: HIGHEST = 3-term bf16
    split, an exact f32 decomposition; sums have one nonzero term)."""
    return jax.lax.dot_general(
        x, selm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _scatter_lanes(x_c, selm):
    """[k, _HALF] -> [k, PIX] inverse routing (zeros on unselected lanes)."""
    return jax.lax.dot_general(
        x_c, selm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


_N_WBUF = 4   # write-buffer ring depth (overlaps write DMAs)


def _forward_kernel(starts_ref, ends_ref, data_hbm, rays_ref,
                    *rest, degree, min_transmittance, min_response,
                    min_alpha, max_alpha, sorted_passes=0, has_t_max=True,
                    aux_outputs=True, emit_flags=False,
                    row_termination=False, census=False, lane_compact=False):
    """With `emit_flags`, a second [W, 8, CHUNK] output carries the per-slot
    max composite weight in row 0 (max over the owning tile's pixels of
    w_ = alpha * T_before; (flag > 0) is exactly the reference's
    hit-accepted particle bit, referenceOptix.cu:158-161 /
    gutProjector.cuh:275), written exactly once per window through a ring
    like the backward kernel's (boundary windows shared by consecutive
    tiles blend additively: slot ranges are disjoint, so each slot carries
    its own tile's max). The donor output is pre-zeroed, so windows past a
    tile's early exit correctly stay 0."""
    if emit_flags:
        # Refs arrive (ins..., outs..., scratch...): the pre-zeroed flags
        # donor input is aliased into the flags output and only written
        # through the alias.
        _zeros_hbm, out_ref, flags_hbm, dbuf, fbuf, sem, fsem, fstate = rest
    else:
        out_ref, dbuf, sem = rest
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    w0 = start // CHUNK
    w1 = jnp.where(end > start, (end - 1) // CHUNK + 1, w0)
    # DMA groups of GROUP consecutive windows (boundary windows outside
    # [start, end) are masked by row_mask, so over-fetch is harmless).
    g0 = w0 // GROUP
    g1 = jnp.where(end > start, (w1 - 1) // GROUP + 1, g0)

    out_ref[0] = jnp.zeros((8, PIX), jnp.float32)
    out_ref[0, 5, :] = jnp.ones((PIX,), jnp.float32)  # transmittance

    rays = rays_ref[0]
    # Per-pixel LAST-TOUCH slot bound (rays row 7, f32 slot index): the
    # pixel composites only slots <= its bound, and the window walk stops
    # once every pixel is saturated OR past its bound. The bound is the
    # last sorted slot whose PROJECTED footprint (same conic/max_power test
    # as tile culling, gutProjector.cuh:49-78) reaches the pixel's tile
    # row — footprint-gated compositing at row granularity, the same
    # approximation family as the reference's per-tile cull, one level
    # finer. Callers must fill rays row 7 (ops/tiles.row_last_touch) when
    # enabling; -1 rows terminate immediately.
    lt = rays[7, :][None, :] if row_termination else None

    # Ring-buffered group DMA: keep PREFETCH groups in flight while
    # computing one (the sequential per-group DMA wait would otherwise
    # dominate: ~2us x #groups).
    def dma(g, slot):
        return pltpu.make_async_copy(data_hbm.at[pl.ds(g * GROUP, GROUP)],
                                     dbuf.at[slot], sem.at[slot])

    for k in range(PREFETCH):
        @pl.when(g0 + k < g1)
        def _(k=k):
            dma(g0 + k, (g0 + k) % _N_DBUF).start()

    if emit_flags:
        @pl.when(t == 0)
        def _():
            fstate[0] = -1
            fstate[1] = 0
            for fs in range(_N_WBUF):
                fstate[2 + fs] = -1

        def wait_flag_write(fs):
            @pl.when(fstate[2 + fs] >= 0)
            def _():
                pltpu.make_async_copy(
                    fbuf.at[fs],
                    flags_hbm.at[pl.ds(fstate[2 + fs] * GROUP, GROUP)],
                    fsem.at[fs]).wait()
            fstate[2 + fs] = -1

    def body(state):
        g = state[0]
        slot = g % _N_DBUF
        dma(g, slot).wait()

        @pl.when(g + PREFETCH < g1)
        def _():
            dma(g + PREFETCH, (g + PREFETCH) % _N_DBUF).start()

        flag_blocks = []
        for j in range(GROUP):
            w = g * GROUP + j
            S = dbuf[slot, j]
            row_mask = _row_mask(w, start, end)

            # hit_t is consumed by the depth output, the per-ray segment
            # test, and the re-sort keys; with none of those needed its
            # 7-pass chain is skipped (aux_outputs=False: the training loss
            # reads only rgb + opacity).
            need_hit_t = aux_outputs or has_t_max or bool(sorted_passes)
            q = _pair_quantities(S, rays, degree, need_hit_t=need_hit_t,
                                 has_t_max=has_t_max)
            alpha, _ = _alpha_from_raw(q, row_mask, min_response, min_alpha,
                                       max_alpha)
            row_idx = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                       + w * CHUNK)
            if row_termination:
                alpha = jnp.where(row_idx.astype(jnp.float32) <= lt,
                                  alpha, 0.0)
            one_m = 1.0 - alpha
            excl, _ = _t_before_excl(alpha, one_m, q, sorted_passes,
                                     row_idx, start, end)
            t_carry = out_ref[0, 5, :][None, :]
            t_before = t_carry * excl
            live = t_before > min_transmittance
            w_ = jnp.where(live, alpha * t_before, 0.0)

            rgb = jax.lax.dot_general(
                S[13:16, :], w_, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [3, PIX]
            out_ref[0, 0:3, :] += rgb
            out_ref[0, 3, :] += jnp.sum(w_, axis=0)
            if aux_outputs:
                out_ref[0, 4, :] += jnp.sum(w_ * q["hit_t"], axis=0)
                out_ref[0, 6, :] += jnp.sum((w_ > 0.0).astype(jnp.float32),
                                            axis=0)
            # Transmittance is monotone non-increasing along COMPOSITING
            # order and frozen at ray termination (dead rows composite
            # nothing), so the end-of-window carry is min over LIVE rows of
            # T-after-row, floored at the incoming carry — order-
            # independent, which also makes it exact under the per-ray
            # re-sorted mode.
            t_after = jnp.where(live, t_before * one_m, jnp.float32(3.4e38))
            out_ref[0, 5, :] = jnp.minimum(jnp.min(t_after, axis=0),
                                           t_carry[0])
            if emit_flags:
                # Weight-VALUED flag (r5): per-slot max composite weight
                # over the tile's pixels. (x > 0) reductions downstream
                # recover the original contributed BIT exactly (weights are
                # non-negative); callers may instead threshold (temporal
                # visibility culling, render/infer.py).
                contrib = jnp.max(w_, axis=1, keepdims=True).T  # [1, CHUNK]
                flag_blocks.append(jnp.concatenate(
                    [contrib, jnp.zeros((7, CHUNK), jnp.float32)], axis=0))

        if emit_flags:
            Fs = jnp.stack(flag_blocks, axis=0)    # [GROUP, 8, CHUNK]
            k = fstate[1]
            prev_slot = (k + _N_WBUF - 1) % _N_WBUF
            same = (g == fstate[0]) & (k > 0)
            Fs = Fs + jnp.where(same, fbuf[prev_slot], 0.0)
            fs = k % _N_WBUF
            wait_flag_write(fs)
            @pl.when(same & (prev_slot != fs))
            def _():
                wait_flag_write(prev_slot)
            fbuf[fs] = Fs
            pltpu.make_async_copy(fbuf.at[fs],
                                  flags_hbm.at[pl.ds(g * GROUP, GROUP)],
                                  fsem.at[fs]).start()
            fstate[2 + fs] = g
            fstate[0] = g
            fstate[1] = k + 1
        needed = out_ref[0, 5, :] > min_transmittance
        if row_termination:
            nxt = ((g + 1) * GROUP * CHUNK).astype(jnp.float32)
            needed = needed & (rays[7, :] >= nxt)
        alive = jnp.any(needed)
        if census:
            # Slots walked while MORE than 128 / 64 pixels were still
            # unsaturated — the lane-compaction sizing census (a half-width
            # window pass can only help slots walked at <= 128 alive).
            # Counted at window END (one-window off vs the start state).
            c128, c64 = state[2], state[3]
            cnt = jnp.sum(needed.astype(jnp.int32))
            ws = GROUP * CHUNK
            in_rng = (jnp.clip((g + 1) * ws, start, end)
                      - jnp.clip(g * ws, start, end))
            c128 = c128 + jnp.where(cnt > 128, in_rng, 0)
            c64 = c64 + jnp.where(cnt > 64, in_rng, 0)
            return g + 1, alive, c128, c64
        if lane_compact:
            # `wide` = more than _HALF pixels still unsaturated; loop 1
            # exits as soon as the tile fits in half-width windows. The
            # cross-lane count is amortized to every 4th window (delays
            # the switch by <= 3 windows; the count itself costs ~a VPU
            # reduce per window otherwise).
            wide = jax.lax.cond(
                (g & 3) == 3,
                lambda: jnp.sum(needed.astype(jnp.int32)) > _HALF,
                lambda: state[2])
            return g + 1, alive, wide
        return g + 1, alive

    def cond(state):
        keep = (state[0] < g1) & state[1]
        if lane_compact:
            keep = keep & state[2]
        return keep

    alive0 = jnp.bool_(True)
    if row_termination:
        alive0 = jnp.any(rays[7, :] >= (g0 * GROUP * CHUNK)
                         .astype(jnp.float32))
    if census:
        state0 = (g0, alive0, jnp.int32(0), jnp.int32(0))
    elif lane_compact:
        state0 = (g0, alive0, jnp.bool_(True))
    else:
        state0 = (g0, alive0)
    fin = jax.lax.while_loop(cond, body, state0)
    gf = fin[0]

    if lane_compact:
        # ---- half-width tail: <= _HALF unsaturated pixels remain ----
        # Route them into compact lanes with exact one-hot matmuls; every
        # [CHUNK, PIX] pass below becomes [CHUNK, _HALF] (VPU time scales
        # with lanes). Loop-1 partial sums seed the compact accumulators;
        # the tail's results are routed back at the end. Bit-exact vs the
        # full-width walk: the math per (slot, selected pixel) is
        # unchanged, and unselected pixels are saturated (composite
        # nothing either way).
        needed0 = out_ref[0, 5, :] > min_transmittance
        if row_termination:
            needed0 = needed0 & (rays[7, :]
                                 >= (gf * GROUP * CHUNK).astype(jnp.float32))
        # Loop 1 can also end by EXHAUSTING the range while still wide
        # (> _HALF alive) — then there is nothing to compact and the merge
        # below must not touch the output (_lane_select would drop lanes
        # ranked past _HALF).
        needed0 = needed0 & (jnp.sum(needed0.astype(jnp.int32)) <= _HALF)
        selm = _lane_select(needed0)
        rays_c = _compact_lanes(rays, selm)                 # [8, _HALF]
        acc0 = _compact_lanes(out_ref[0], selm)             # [8, _HALF]
        lt_c = rays_c[7, :][None, :] if row_termination else None
        need_hit_t2 = aux_outputs or has_t_max or bool(sorted_passes)

        def body2(state):
            g, rgb_c, opa_c, dep_c, t_c, hit_c, _ = state
            slot = g % _N_DBUF
            dma(g, slot).wait()

            @pl.when(g + PREFETCH < g1)
            def _():
                dma(g + PREFETCH, (g + PREFETCH) % _N_DBUF).start()

            for j in range(GROUP):
                w = g * GROUP + j
                S = dbuf[slot, j]
                row_mask = _row_mask(w, start, end)
                q = _pair_quantities(S, rays_c, degree,
                                     need_hit_t=need_hit_t2,
                                     has_t_max=has_t_max)
                alpha, _ = _alpha_from_raw(q, row_mask, min_response,
                                           min_alpha, max_alpha)
                row_idx = (jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, 1), 0) + w * CHUNK)
                if row_termination:
                    alpha = jnp.where(row_idx.astype(jnp.float32) <= lt_c,
                                      alpha, 0.0)
                one_m = 1.0 - alpha
                excl, _ = _t_before_excl(alpha, one_m, q, sorted_passes,
                                         row_idx, start, end)
                t_before = t_c * excl
                live = t_before > min_transmittance
                w_ = jnp.where(live, alpha * t_before, 0.0)
                rgb_c = rgb_c + jax.lax.dot_general(
                    S[13:16, :], w_,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)    # [3, _HALF]
                opa_c = opa_c + jnp.sum(w_, axis=0)[None, :]
                if aux_outputs:
                    dep_c = dep_c + jnp.sum(w_ * q["hit_t"], axis=0)[None, :]
                    hit_c = hit_c + jnp.sum(
                        (w_ > 0.0).astype(jnp.float32), axis=0)[None, :]
                t_after = jnp.where(live, t_before * one_m,
                                    jnp.float32(3.4e38))
                t_c = jnp.minimum(jnp.min(t_after, axis=0)[None, :], t_c)
            needed2 = t_c[0] > min_transmittance
            if row_termination:
                nxt = ((g + 1) * GROUP * CHUNK).astype(jnp.float32)
                needed2 = needed2 & (rays_c[7, :] >= nxt)
            return (g + 1, rgb_c, opa_c, dep_c, t_c, hit_c,
                    jnp.any(needed2))

        def cond2(state):
            return (state[0] < g1) & state[6]

        alive2 = jnp.any(acc0[5, :] > min_transmittance)
        if row_termination:
            alive2 = alive2 & jnp.any(
                rays_c[7, :] >= (gf * GROUP * CHUNK).astype(jnp.float32))
        fin2 = jax.lax.while_loop(
            cond2, body2,
            (gf, acc0[0:3], acc0[3:4], acc0[4:5], acc0[5:6], acc0[6:7],
             alive2))
        gf = fin2[0]
        acc_f = jnp.concatenate(
            [fin2[1], fin2[2], fin2[3], fin2[4], fin2[5], acc0[7:8]],
            axis=0)                                         # [8, _HALF]
        sel = needed0[None, :]
        out_ref[0] = jnp.where(sel, _scatter_lanes(acc_f, selm), out_ref[0])

    # Free diagnostics in the pad row: lane 0 = slots this tile actually
    # WALKED (early exit stops at gf); with `census`, lane 1/2 = slots
    # walked while alive>128 / alive>64, lane 3 = final unsaturated pixel
    # count. Consumed by tools/bench_stages.py; nothing downstream reads
    # row 7.
    walked = (jnp.clip(gf * GROUP * CHUNK, start, end)
              - start).astype(jnp.float32)
    if census:
        lane = jax.lax.broadcasted_iota(jnp.int32, (PIX,), 0)
        unsat = jnp.sum((out_ref[0, 5, :]
                         > min_transmittance).astype(jnp.float32))
        row7 = jnp.where(lane == 1, fin[2].astype(jnp.float32), walked)
        row7 = jnp.where(lane == 2, fin[3].astype(jnp.float32), row7)
        row7 = jnp.where(lane == 3, unsat, row7)
        out_ref[0, 7, :] = row7
    else:
        out_ref[0, 7, :] = jnp.full((PIX,), walked)

    # Early exit may leave up to PREFETCH started-but-unconsumed DMAs (the
    # invariant is: groups gf..min(g1, gf+PREFETCH)-1 are in flight); drain
    # them so the semaphores are clean for the next grid step (scratch
    # persists).
    for k in range(PREFETCH):
        @pl.when(gf + k < g1)
        def _(k=k):
            dma(gf + k, (gf + k) % _N_DBUF).wait()

    if emit_flags:
        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            for fs in range(_N_WBUF):
                wait_flag_write(fs)


def _backward_kernel(starts_ref, ends_ref, data_hbm, rays_ref, fwd_ref,
                     gout_ref, zeros_hbm, gdata_hbm, dbuf, wbuf, sem,
                     wsem, wstate, *, degree, min_transmittance, min_response,
                     min_alpha, max_alpha, sorted_passes=0, has_t_max=True,
                     aux_grads=True, lowprec_grads=False,
                     row_termination=False, lane_compact=False):
    """Single re-walk front-to-back; suffix sums recovered from forward totals.

    fwd_ref: forward outputs block [1, 8, PIX]; gout_ref: incoming gradients,
    same layout (rows 0-2 d_rgb, 3 d_opacity, 4 d_depth, 5 d_transmittance).
    The output buffer is donated pre-zeroed (input_output_aliases), so the
    walk early-exits with the forward's transmittance criterion — untouched
    windows keep zero gradients.

    Gradient windows are written EXACTLY ONCE, never read back: a GROUP of
    windows shared by several consecutive tiles (tile ranges are contiguous
    in slot order, so all sharers are consecutive grid steps) is blended in
    VMEM via the persistent write-buffer ring — each later write contains
    every earlier tile's rows, so no read-modify-write DMA and no per-group
    write stall (writes overlap the next groups' compute; hazards are
    tracked in SMEM `wstate`: [0]=last group written, [1]=write counter,
    [2+s]=pending group id per ring slot or -1).
    """
    del zeros_hbm  # aliased into gdata_hbm; only written through the alias
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    w0 = start // CHUNK
    w1 = jnp.where(end > start, (end - 1) // CHUNK + 1, w0)
    g0 = w0 // GROUP
    g1 = jnp.where(end > start, (w1 - 1) // GROUP + 1, g0)

    @pl.when(t == 0)
    def _():
        wstate[0] = -1
        wstate[1] = 0
        for s in range(_N_WBUF):
            wstate[2 + s] = -1

    def dma_data(g, slot):
        return pltpu.make_async_copy(data_hbm.at[pl.ds(g * GROUP, GROUP)],
                                     dbuf.at[slot], sem.at[slot])

    def wait_write(s):
        """Complete the pending gradient-write on ring slot s, if any."""
        @pl.when(wstate[2 + s] >= 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[s],
                gdata_hbm.at[pl.ds(wstate[2 + s] * GROUP, GROUP)],
                wsem.at[s]).wait()
        wstate[2 + s] = -1

    for k in range(PREFETCH):
        @pl.when(g0 + k < g1)
        def _(k=k):
            dma_data(g0 + k, (g0 + k) % _N_DBUF).start()

    rays = rays_ref[0]
    dC = gout_ref[0, 0:3, :]          # [3, PIX]
    dO = gout_ref[0, 3, :][None, :]   # [1, PIX]
    # aux_grads=False asserts the caller's loss consumes only rgb + opacity
    # (the reference training loss: trainer.py 0.8*L1 + 0.2*DSSIM on rgb) —
    # the depth/transmittance cotangent chains (~20 VPU passes per window)
    # are skipped entirely.
    dD = gout_ref[0, 4, :][None, :] if aux_grads else None
    dT = gout_ref[0, 5, :][None, :] if aux_grads else None
    t_final = fwd_ref[0, 5, :][None, :]
    # Total of w_k * q_k over all hits, from the forward outputs:
    # sum w c . dC + sum w . dO + sum (w hitT) . dD
    a_tot = (fwd_ref[0, 0, :] * dC[0, :] + fwd_ref[0, 1, :] * dC[1, :]
             + fwd_ref[0, 2, :] * dC[2, :]
             + fwd_ref[0, 3, :] * dO[0, :])[None, :]
    if aux_grads:
        a_tot = a_tot + (fwd_ref[0, 4, :] * dD[0, :])[None, :]

    def emit_g(g, g_blocks):
        # Group-shared blend without RMW: rows outside [start, end) are
        # zero; if the previous write targeted this same GROUP (boundary
        # shared with the preceding tile), add its buffered contents.
        Gs = jnp.stack(g_blocks, axis=0)             # [GROUP, ROW_F, CHUNK]
        k = wstate[1]
        prev_slot = (k + _N_WBUF - 1) % _N_WBUF   # == (k-1) mod NW, k >= 0
        same = (g == wstate[0]) & (k > 0)
        Gs = Gs + jnp.where(same, wbuf[prev_slot], 0.0)
        s = k % _N_WBUF
        wait_write(s)                 # ring-slot reuse hazard
        @pl.when(same & (prev_slot != s))
        def _():
            wait_write(prev_slot)     # same-group write ordering
        wbuf[s] = Gs
        pltpu.make_async_copy(wbuf.at[s],
                              gdata_hbm.at[pl.ds(g * GROUP, GROUP)],
                              wsem.at[s]).start()
        wstate[2 + s] = g
        wstate[0] = g
        wstate[1] = k + 1

    def make_body(cx, lane_tail):
        def body(state):
            g, t_carry_v, prefix_v = state[:3]
            slot = g % _N_DBUF
            dma_data(g, slot).wait()

            @pl.when(g + PREFETCH < g1)
            def _():
                dma_data(g + PREFETCH, (g + PREFETCH) % _N_DBUF).start()

            g_blocks = []
            for j in range(GROUP):
                w = g * GROUP + j
                t_carry_v, prefix_v, G = _bwd_window(
                    dbuf[slot, j], w, t_carry_v, prefix_v, cx)
                g_blocks.append(G)
            emit_g(g, g_blocks)
            if lane_compact and not lane_tail:
                wide = jax.lax.cond(
                    (g & 3) == 3,
                    lambda: (jnp.sum((t_carry_v > min_transmittance)
                                     .astype(jnp.int32)) > _HALF),
                    lambda: state[3])
                return g + 1, t_carry_v, prefix_v, wide
            return g + 1, t_carry_v, prefix_v
        return body

    def _bwd_window(S, w, t_carry_v, prefix_v, cx):
        rays, dC, dO, dD, dT, a_tot, t_final = cx
        npix = rays.shape[1]
        row_mask = _row_mask(w, start, end)

        need_hit_t = aux_grads or has_t_max or bool(sorted_passes)
        q = _pair_quantities(S, rays, degree, need_hit_t=need_hit_t,
                             has_t_max=has_t_max)
        alpha, accept = _alpha_from_raw(q, row_mask, min_response, min_alpha,
                                        max_alpha)
        row_idx = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                   + w * CHUNK)
        if row_termination:
            # Mirror the forward's footprint gate (see _forward_kernel);
            # gated pairs carry one_m == 1 and w_ == 0, so their gradients
            # vanish through the w_ > 0 masks below.
            alpha = jnp.where(row_idx.astype(jnp.float32)
                              <= rays[7, :][None, :], alpha, 0.0)
        one_m = 1.0 - alpha
        excl, masks = _t_before_excl(alpha, one_m, q, sorted_passes,
                                     row_idx, start, end)
        t_before = t_carry_v[None, :] * excl
        live = t_before > min_transmittance
        w_ = jnp.where(live, alpha * t_before, 0.0)

        # Per-hit pixel contribution q_j = c_j . dC + hitT_j * dD + dO.
        # Broadcast outer products (see _pair_quantities): exact f32, and
        # cheaper than a k=3 HIGHEST matmul.
        qj = (S[13, :][:, None] * dC[0, :][None, :]
              + S[14, :][:, None] * dC[1, :][None, :]
              + S[15, :][:, None] * dC[2, :][None, :])  # [CHUNK, PIX]
        qj = qj + q["hit_t"] * dD + dO if aux_grads else qj + dO

        wq = w_ * qj
        if sorted_passes:
            # Suffix over COMPOSITING order: route wq through the recorded
            # network, prefix there, route the suffix back.
            wq_s = _apply_swaps(masks, wq, sorted_passes, inverse=False)
            incl_s = _tri_matmuls(wq_s, strict_lower=False)
            suffix_s = a_tot - prefix_v[None, :] - incl_s
            suffix = _apply_swaps(masks, suffix_s, sorted_passes,
                                  inverse=True)
        else:
            incl = _tri_matmuls(wq, strict_lower=False)  # inclusive prefix
            suffix = a_tot - prefix_v[None, :] - incl    # sum_{k>j} w_k q_k

        inv_one_m = 1.0 / jnp.maximum(one_m, 1e-6)
        d_alpha_core = t_before * qj - suffix * inv_one_m
        if aux_grads:
            d_alpha_core = d_alpha_core - dT * t_final * inv_one_m
        d_alpha = jnp.where(w_ > 0.0, d_alpha_core, 0.0)

        # alpha = min(max_alpha, resp * opacity); clamp kills the gradient.
        unclamped = (q["alpha_raw"] < max_alpha) & accept
        d_resp = jnp.where(unclamped, q["opacity"] * d_alpha, 0.0)
        d_opacity_pair = jnp.where(unclamped, q["resp"] * d_alpha, 0.0)
        d_g = d_resp * q["dresp_dg"]

        d_crsq = d_g * q["inv_vsq"]
        d_vsq = (-q["g"] * q["inv_vsq"]) * d_g
        if aux_grads:
            # hitT = |v.u| / vsq enters through depth: dL/dhitT = w * dD.
            d_hit = jnp.where(w_ > 0.0, w_ * dD, 0.0)
            sign_m = jnp.sign(q["vdotu"])
            d_m = sign_m * q["inv_vsq"] * d_hit
            d_vsq = d_vsq + (-q["hit_t"] * q["inv_vsq"]) * d_hit

        u, v, cr = q["u"], q["v"], q["cr"]
        # d crsq/du = 2 (cr x v); d crsq/dv = 2 (u x cr). NOTE: the triple-
        # product identity (cr x v = u|v|^2 - v(v.u)) is ~18 VPU ops cheaper
        # but was measured to FAIL gradcheck: the two terms cancel for
        # near-axis anisotropic particles (abs err ~eps|u||v|^2 where the
        # true value is |u_perp||v|^2) — keep the exact cross form.
        crxv = [cr[1] * v[2] - cr[2] * v[1],
                cr[2] * v[0] - cr[0] * v[2],
                cr[0] * v[1] - cr[1] * v[0]]
        uxcr = [u[1] * cr[2] - u[2] * cr[1],
                u[2] * cr[0] - u[0] * cr[2],
                u[0] * cr[1] - u[1] * cr[0]]
        if aux_grads:
            du = [2.0 * d_crsq * crxv[i] + d_m * v[i] for i in range(3)]
            dv = [2.0 * d_crsq * uxcr[i] + d_m * u[i] + 2.0 * d_vsq * v[i]
                  for i in range(3)]
        else:
            du = [2.0 * d_crsq * crxv[i] for i in range(3)]
            dv = [2.0 * d_crsq * uxcr[i] + 2.0 * d_vsq * v[i]
                  for i in range(3)]

        # Chain to packed row entries, summed over pixels -> [1, CHUNK] rows.
        # dA[r, k] = sum_pix du_r * (o_k - p_k) + dv_r * d_k. The pixel
        # reductions ride the MXU: [o; 1] @ du_r^T yields sum du_r*o_k for
        # k=0..2 plus sum du_r in one [4, CHUNK] pass (rows already in the
        # output orientation — no sublane->lane transposes).
        o1 = jnp.concatenate([rays[0:3, :],
                              jnp.ones((1, npix), jnp.float32)],
                             axis=0)                       # [4, npix]
        # Gradient-SUM contractions (k = PIX): with lowprec_grads these run
        # at DEFAULT (one bf16 pass) instead of HIGHEST (3-pass f32 split) —
        # ~2^-9 relative error on per-window gradient sums, the same class
        # as the bf16 cotangent reorder this flag also enables
        # (ops/sorted_gather.py). Forward math is untouched either way.
        gprec = (jax.lax.Precision.DEFAULT if lowprec_grads
                 else jax.lax.Precision.HIGHEST)
        M = [jax.lax.dot_general(
            o1, du[r], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gprec) for r in range(3)]
        N = [jax.lax.dot_general(
            rays[3:6, :], dv[r], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gprec) for r in range(3)]
        rows = [M[r][k][None, :] - S[9 + k, :][None, :] * M[r][3][None, :]
                + N[r][k][None, :]
                for r in range(3) for k in range(3)]
        # dmean_k = -sum_r A[r, k] * sum_pix du_r
        rows += [-(S[0 * 3 + k, :][None, :] * M[0][3][None, :]
                   + S[1 * 3 + k, :][None, :] * M[1][3][None, :]
                   + S[2 * 3 + k, :][None, :] * M[2][3][None, :])
                 for k in range(3)]
        rows.append(jnp.sum(d_opacity_pair, axis=1)[None, :])
        # dcolor = sum_pix w * dC_c  -> [3, CHUNK]
        gcol = jax.lax.dot_general(
            dC, w_, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gprec)
        G = jnp.concatenate(rows + [gcol], axis=0)   # [ROW_F, CHUNK]
        keep = row_mask[:, 0][None, :]               # [1, CHUNK] over rows
        G = jnp.where(keep, G, 0.0)

        # Same order-independent min-reduce carry as the forward kernel.
        t_carry_new = jnp.minimum(jnp.min(
            jnp.where(live, t_before * one_m, jnp.float32(3.4e38)), axis=0),
            t_carry_v)
        prefix_new = prefix_v + jnp.sum(wq, axis=0)
        return t_carry_new, prefix_new, G

    def make_cond(cx, lane_tail):
        def cond(state):
            g, t_carry_v = state[0], state[1]
            # Early exit mirrors the forward: once every ray's
            # transmittance is below the floor no later hit has weight or
            # gradient, and the pre-zeroed output already holds the correct
            # (zero) values.
            needed = t_carry_v > min_transmittance
            if row_termination:
                needed = needed & (cx[0][7, :]
                                   >= (g * GROUP * CHUNK)
                                   .astype(jnp.float32))
            keep = (g < g1) & jnp.any(needed)
            if lane_compact and not lane_tail:
                keep = keep & state[3]
            return keep
        return cond

    cx_full = (rays, dC, dO, dD, dT, a_tot, t_final)
    state0 = (g0, jnp.ones((PIX,), jnp.float32),
              jnp.zeros((PIX,), jnp.float32))
    if lane_compact:
        state0 = state0 + (jnp.bool_(True),)
    fin = jax.lax.while_loop(make_cond(cx_full, False),
                             make_body(cx_full, False), state0)
    gf, t_carry_f, prefix_f = fin[0], fin[1], fin[2]

    if lane_compact:
        # ---- half-width tail (see _forward_kernel): <= _HALF rays still
        # carry gradient; route them into compact lanes. Per-slot gradient
        # sums are exact over the compacted lanes (dropped lanes are dead:
        # w_ == 0 chains every contribution to exact +0), up to f32
        # reassociation of the MXU pixel reductions.
        needed0 = t_carry_f > min_transmittance
        if row_termination:
            needed0 = needed0 & (rays[7, :]
                                 >= (gf * GROUP * CHUNK).astype(jnp.float32))
        needed0 = needed0 & (jnp.sum(needed0.astype(jnp.int32)) <= _HALF)
        selm = _lane_select(needed0)

        def comp(x):
            return _compact_lanes(x, selm)

        cx_c = (comp(rays), comp(dC), comp(dO),
                comp(dD) if aux_grads else None,
                comp(dT) if aux_grads else None,
                comp(a_tot), comp(t_final))
        t_c = comp(t_carry_f[None, :])[0]
        p_c = comp(prefix_f[None, :])[0]
        fin2 = jax.lax.while_loop(make_cond(cx_c, True),
                                  make_body(cx_c, True), (gf, t_c, p_c))
        gf = fin2[0]

    # Drain any in-flight prefetches left by an early exit.
    for k in range(PREFETCH):
        @pl.when(gf + k < g1)
        def _(k=k):
            dma_data(gf + k, (gf + k) % _N_DBUF).wait()

    # On the final grid step, complete all outstanding gradient writes.
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        for s in range(_N_WBUF):
            wait_write(s)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _to_windows(data_sorted: jnp.ndarray) -> jnp.ndarray:
    """[capP, ROW_F] -> [W, ROW_F, CHUNK] struct-of-arrays windows."""
    cap = data_sorted.shape[0]
    assert cap % CHUNK == 0, f"capacity {cap} not a multiple of {CHUNK}"
    return data_sorted.reshape(cap // CHUNK, CHUNK, ROW_F).transpose(0, 2, 1)


def _from_windows(wdata: jnp.ndarray) -> jnp.ndarray:
    return wdata.transpose(0, 2, 1).reshape(-1, ROW_F)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def tile_composite(
    data_sorted: jnp.ndarray,   # [capP, 16] gathered packed rows
    tile_starts: jnp.ndarray,   # [num_tiles]
    tile_ends: jnp.ndarray,     # [num_tiles]
    rays: jnp.ndarray,          # [num_tiles, 8, 256]
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
) -> jnp.ndarray:
    """Returns [num_tiles, 8, 256] forward buffer (see module docstring).

    `sorted_passes` > 0 enables the per-ray windowed re-sort ("sorted"
    k-buffer mode); hits displaced up to that many positions from the
    global depth order composite in exact per-ray order.

    `has_t_max=False` asserts every ray's row 6 is <= 0 (unbounded) and
    skips the per-hit segment test. `aux_grads=False` asserts the loss
    consumes only the rgb + opacity outputs (the reference training loss)
    and skips the depth/transmittance cotangent chains in the backward —
    gradients THROUGH depth/transmittance/hit-count are silently dropped
    when the flag is set, so only set it from a caller that owns the loss.
    `aux_outputs=False` additionally leaves the depth (row 4) and hit-count
    (row 6) outputs at zero, skipping their forward math; it requires
    aux_grads=False (the backward reconstructs totals from row 4 when
    depth cotangents flow)."""
    assert aux_outputs or not aux_grads, (
        "aux_outputs=False requires aux_grads=False")
    return _forward(data_sorted, tile_starts, tile_ends, rays, degree,
                    min_transmittance, min_response, min_alpha, max_alpha,
                    sorted_passes, has_t_max, aux_outputs,
                    row_termination=row_termination)


def _forward(data_sorted, tile_starts, tile_ends, rays, degree,
             min_transmittance, min_response, min_alpha, max_alpha,
             sorted_passes=0, has_t_max=True, aux_outputs=True,
             emit_flags=False, row_termination=False, census=False):
    """With emit_flags, returns (out, flags_slot [capP] f32 per-slot max
    composite weight, > 0 iff contributed); the flags leg has NO vjp
    (eval-only callers).
    `census` swaps output row 7 to the lane-compaction sizing counters
    (probe-only; see _forward_kernel)."""
    num_tiles = rays.shape[0]
    wdata = _to_windows(data_sorted)
    lane_compact = _LANE_COMPACT and not emit_flags and not census
    kern = functools.partial(
        _forward_kernel, degree=degree, min_transmittance=min_transmittance,
        min_response=min_response, min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes, has_t_max=has_t_max,
        aux_outputs=aux_outputs, emit_flags=emit_flags,
        row_termination=row_termination, census=census,
        lane_compact=lane_compact)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # window data stays in HBM
        pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32)
    scratch = [
        pltpu.VMEM((_N_DBUF, GROUP, ROW_F, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((_N_DBUF,)),
    ]
    assert wdata.shape[0] % GROUP == 0, (wdata.shape, GROUP)
    if not emit_flags:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(num_tiles,), in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch)
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_should_interpret(),
        )(tile_starts, tile_ends, wdata, rays)

    fshape = jax.ShapeDtypeStruct(wdata.shape[:1] + (8, CHUNK), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles,),
        in_specs=in_specs + [pl.BlockSpec(memory_space=pl.ANY)],  # donor
        out_specs=[out_specs, pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            scratch[0],
            pltpu.VMEM((_N_WBUF, GROUP, 8, CHUNK), jnp.float32),
            scratch[1],
            pltpu.SemaphoreType.DMA((_N_WBUF,)),
            pltpu.SMEM((2 + _N_WBUF,), jnp.int32),
        ],
    )
    zeros = jnp.zeros(fshape.shape, jnp.float32)
    out, flags = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[out_shape, fshape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # Donor index counts after the 2 scalar-prefetch operands:
        # data, rays, zeros -> 4; aliased into output 1 (flags).
        input_output_aliases={4: 1},
        interpret=_should_interpret(),
    )(tile_starts, tile_ends, wdata, rays, zeros)
    return out, flags[:, 0, :].reshape(-1)


def _fwd_rule(data_sorted, tile_starts, tile_ends, rays, degree,
              min_transmittance, min_response, min_alpha, max_alpha,
              sorted_passes=0, has_t_max=True, aux_grads=True,
              aux_outputs=True, lowprec_grads=False, row_termination=False):
    out = _forward(data_sorted, tile_starts, tile_ends, rays, degree,
                   min_transmittance, min_response, min_alpha, max_alpha,
                   sorted_passes, has_t_max, aux_outputs,
                   row_termination=row_termination)
    return out, (data_sorted, tile_starts, tile_ends, rays, out)


def _bwd_rule(degree, min_transmittance, min_response, min_alpha, max_alpha,
              sorted_passes, has_t_max, aux_grads, aux_outputs, lowprec_grads,
              row_termination, res, g_out):
    data_sorted, tile_starts, tile_ends, rays, out = res
    g_windows = _backward_windows(
        data_sorted, tile_starts, tile_ends, rays, out, g_out, degree=degree,
        min_transmittance=min_transmittance, min_response=min_response,
        min_alpha=min_alpha, max_alpha=max_alpha, sorted_passes=sorted_passes,
        has_t_max=has_t_max, aux_grads=aux_grads,
        lowprec_grads=lowprec_grads, row_termination=row_termination)
    g_data = _from_windows(g_windows)
    return g_data, None, None, None


def _backward_windows(data_sorted, tile_starts, tile_ends, rays, out, g_out,
                      *, degree, min_transmittance, min_response, min_alpha,
                      max_alpha, sorted_passes, has_t_max, aux_grads,
                      lowprec_grads, row_termination):
    """Backward kernel pass returning per-slot gradients in WINDOW layout
    [W, ROW_F, CHUNK] (struct-of-arrays, same as the forward's HBM list).

    Exposed separately from _bwd_rule so the fused walked-compaction path
    (ops/fused_raster.py) can gather whole windows out of it without first
    materializing the [capP, ROW_F] transpose."""
    num_tiles = rays.shape[0]
    wdata = _to_windows(data_sorted)
    kern = functools.partial(
        _backward_kernel, degree=degree,
        min_transmittance=min_transmittance, min_response=min_response,
        min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes, has_t_max=has_t_max,
        aux_grads=aux_grads, lowprec_grads=lowprec_grads,
        row_termination=row_termination, lane_compact=_LANE_COMPACT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # pre-zeroed output donor
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_N_DBUF, GROUP, ROW_F, CHUNK), jnp.float32),  # data
            pltpu.VMEM((_N_WBUF, GROUP, ROW_F, CHUNK), jnp.float32),  # write
            pltpu.SemaphoreType.DMA((_N_DBUF,)),
            pltpu.SemaphoreType.DMA((_N_WBUF,)),
            pltpu.SMEM((2 + _N_WBUF,), jnp.int32),
        ],
    )
    assert wdata.shape[0] % GROUP == 0, (wdata.shape, GROUP)
    zeros = jnp.zeros(wdata.shape, jnp.float32)
    g_windows = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(wdata.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # Alias the zeros donor (input index counts after the 2 scalar-
        # prefetch operands: data, rays, out, g_out, zeros -> 6).
        input_output_aliases={6: 0},
        interpret=_should_interpret(),
    )(tile_starts, tile_ends, wdata, rays, out, g_out, zeros)
    return g_windows


tile_composite.defvjp(_fwd_rule, _bwd_rule)
