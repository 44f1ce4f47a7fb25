"""Pallas TPU slot-expansion for tile binning.

Produces, for every intersection slot, the lexicographic sort keys and the
owning particle id — the expansion half of the reference's CUB pipeline
(threedgut_tracer/src/gutRenderer.cu:241-398 expandTileProjections), fused
with the per-pair tile-id decode and per-tile power-response culling
(gutProjector.cuh:49-78).

Replaces an XLA chain whose cost is per-row dispatch, not bandwidth
(1-D delta scatter at segment starts ~18 ms + [cap]-cumsum + 3.4M-row
11-channel attribute gather ~26 ms + key math, at cap=3.4M on v5e) with:

  * one 2-operand sort + one 1M-row gather that COMPACT live particles by
    rank (strictly-increasing segment ends — interleaved zero-count
    particles would otherwise unbound the per-window particle span),
  * a Pallas pass over 256-slot windows: each window's owning particles are
    <= 257 consecutive ranks, located by a scalar-prefetched block index;
    one [16, 512] x [256, 512]^T one-hot matmul expands every channel
    (slot-membership built from start/count channels), and the tile-id /
    culling / key math runs on the expanded rows in-register.

Exactness: each slot has exactly one owning rank, so the one-hot matmul is
a selection; at HIGHEST precision the MXU's 3-term bf16 split reconstructs
the f32 attribute bit-exactly (8+8+8 mantissa bits), keeping integer
channels (particle id, tile coords) exact and depth keys identical to the
XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedgrut_tpu import constants as C
# Module-attr lookup (not a from-import) so tools/tpu_vs_cpu_check.py's
# per-device monkeypatch of tile_raster._should_interpret applies here too.
from threedgrut_tpu.ops.pallas import tile_raster

SBLK = 256        # slots per window
RCH = 16          # attr channels (padded)

# Channel layout of the rank-compacted attribute table [RCH, m_pad].
# M0/M1/M2 carry the 64-bit per-bbox-cell survival mask (count-time per-tile
# culling) packed as 24+24+16-bit non-negative ints — exact in f32, so the
# one-hot MXU expansion reconstructs them bit-exactly. All-zero masks flag a
# NON-maskable particle (bbox > 8x8 tiles, or culling disabled): its cells
# are emitted densely and culled at expansion time instead.
CH_TMINX, CH_TMINY, CH_BBOXW, CH_COUNT, CH_M0 = 0, 1, 2, 3, 4
CH_CA, CH_CB, CH_CC, CH_CX, CH_CY, CH_MAXPOW = 5, 6, 7, 8, 9, 10
CH_M1, CH_M2, CH_START, CH_PIDX, CH_ONE = 11, 12, 13, 14, 15


def _popcount(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of non-negative int32 (< 2^31). The final multiply
    wraps mod 2^32 by XLA int semantics; the top byte (sum of byte counts,
    <= 32) stays below the sign bit, so the arithmetic >> 24 is exact."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def select_nth_set_bit(m0, m1, m2, r):
    """Bit position (0..63) of the (r+1)-th set bit of the 64-bit mask
    packed as 24+24+16-bit int32 words. Vectorized; undefined (but finite)
    when r >= popcount. Used by both the Pallas expansion kernel and the
    XLA oracle path to map a slot's local index to its surviving bbox cell.
    """
    c0 = _popcount(m0)
    c1 = _popcount(m1)
    in1 = (r >= c0) & (r < c0 + c1)
    in2 = r >= (c0 + c1)
    m = jnp.where(in2, m2, jnp.where(in1, m1, m0))
    rr = r - jnp.where(in2, c0 + c1, jnp.where(in1, c0, 0))
    base = jnp.where(in2, 48, jnp.where(in1, 24, 0))
    for width in (16, 8, 4, 2, 1):
        low = m & ((1 << width) - 1)
        c = _popcount(low)
        go = rr >= c
        base = base + jnp.where(go, width, 0)
        rr = rr - jnp.where(go, c, 0)
        m = jnp.where(go, m >> width, low)
    return base


def cull_masks(tile_min, tile_max, n_tiles, conic, center, max_power,
               tile_culling: bool):
    """Count-time per-tile culling (VERDICT r2 item 1a): evaluate the
    reference's tile-min power test (gutProjector.cuh:49-78) for every bbox
    cell of every particle whose bbox fits 8x8 tiles, and return
    (culled counts [N] i32, m0, m1, m2 [N] i32 mask words). Culled pairs
    then never consume intersection capacity — every per-slot stage (sorts,
    gathers, segment sums) shrinks by the cull rate. Non-maskable particles
    (bbox > 8x8; rare) keep their dense bbox count and mask words 0 — they
    are culled at expansion time exactly as before.

    Consistency contract: counts == popcount(mask) == cells emitted by the
    expansion for maskable particles. The expansion's own power re-test may
    disagree in the last bit without harm — a counted-but-retested-out cell
    just gets the sentinel tile (same as the legacy path)."""
    from threedgrut_tpu.ops.projection import tile_min_power_response
    import os
    n = n_tiles.shape[0]
    z = jnp.zeros((n,), jnp.int32)
    if not tile_culling:
        return n_tiles.astype(jnp.int32), z, z, z
    if (n % _CM_BLK == 0 and not tile_raster._should_interpret()
            and os.environ.get("THREEDGRUT_CULLMASK", "pallas") != "xla"):
        return cull_masks_pallas(tile_min, tile_max, n_tiles, conic,
                                 center, max_power)
    bw = (tile_max[:, 0] - tile_min[:, 0]).astype(jnp.int32)
    bh = (tile_max[:, 1] - tile_min[:, 1]).astype(jnp.int32)
    maskable = (bw <= 8) & (bh <= 8)
    # One batched [N, 64] evaluation (a 64-step Python loop breaks XLA
    # fusion into 64 chains re-reading the per-particle channels — measured
    # ~19 ms at N=1M vs ~4 ms for this form).
    dy = jnp.arange(8, dtype=jnp.int32)
    dx = jnp.arange(8, dtype=jnp.int32)
    oy = jnp.repeat(dy, 8)[None, :]                      # [1, 64]
    ox = jnp.tile(dx, 8)[None, :]                        # [1, 64]
    tmin_f = tile_min.astype(jnp.float32)
    txy = jnp.stack([tmin_f[:, 0:1] + ox.astype(jnp.float32),
                     tmin_f[:, 1:2] + oy.astype(jnp.float32)],
                    axis=-1)                             # [N, 64, 2]
    power = tile_min_power_response(txy, conic[:, None, :],
                                    center[:, None, :])  # [N, 64]
    inside = (ox < bw[:, None]) & (oy < bh[:, None])
    ok = inside & (power < max_power[:, None])
    j = oy * bw[:, None] + ox                            # [N, 64] cell id
    cnt = jnp.sum(ok, axis=1, dtype=jnp.int32)
    words = []
    for lo, wid in ((0, 24), (24, 24), (48, 16)):
        sh = jnp.clip(j - lo, 0, 31)
        bit = jnp.where(ok & (j >= lo) & (j < lo + wid), 1 << sh, 0)
        words.append(jnp.sum(bit, axis=1, dtype=jnp.int32))
    # Gate on the projector's own count: invalid particles carry n_tiles=0
    # with a possibly nonzero bbox — the mask must not resurrect them.
    live = n_tiles > 0
    counts = jnp.where(live, jnp.where(maskable, cnt,
                                       n_tiles.astype(jnp.int32)), 0)
    keep = live & maskable
    return (counts,
            jnp.where(keep, words[0], 0),
            jnp.where(keep, words[1], 0),
            jnp.where(keep, words[2], 0))


def _kernel(pa_ref, a0_ref, a1_ref, out_ref, *, gx, num_tiles, tile_culling,
            pid_sentinel):
    w = pl.program_id(0)
    attrs = jnp.concatenate([a0_ref[...], a1_ref[...]], axis=1)  # [RCH, 512]

    sg = (jax.lax.broadcasted_iota(jnp.int32, (SBLK, 1), 0).astype(
        jnp.float32) + jnp.float32(w * SBLK))      # [SBLK, 1] global slot
    start = attrs[CH_START, :][None, :]            # [1, 512]
    endp = start + attrs[CH_COUNT, :][None, :]
    member = ((sg >= start) & (sg < endp)).astype(jnp.float32)  # [SBLK, 512]

    # One matmul expands every channel to its slot: exact selection (each
    # slot has exactly one owning rank; see module docstring).
    ex = jax.lax.dot_general(
        attrs, member, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [RCH, SBLK]

    owned = ex[CH_ONE, :][None, :] > 0.0
    sg_row = (jax.lax.broadcasted_iota(jnp.int32, (1, SBLK), 1).astype(
        jnp.float32) + jnp.float32(w * SBLK))
    local = sg_row - ex[CH_START, :][None, :]
    bbox_w = jnp.maximum(ex[CH_BBOXW, :][None, :], 1.0)
    # Local slot index -> bbox cell: for MASKABLE particles (nonzero mask
    # words) the local-th SURVIVING cell via a bit-rank select over the
    # count-time culling mask; for non-maskable (mask words all zero) the
    # identity (dense emission, culled below at expansion time).
    m0 = ex[CH_M0, :][None, :].astype(jnp.int32)
    m1 = ex[CH_M1, :][None, :].astype(jnp.int32)
    m2 = ex[CH_M2, :][None, :].astype(jnp.int32)
    local_i = local.astype(jnp.int32)
    sel = select_nth_set_bit(m0, m1, m2, jnp.maximum(local_i, 0))
    cell = jnp.where((m0 | m1 | m2) == 0, local_i, sel).astype(jnp.float32)
    # Integer floor-div/mod in f32: both operands are small exact integers,
    # and correctly-rounded division cannot cross an integer boundary.
    ty_off = jnp.floor(cell / bbox_w)
    tx_off = cell - ty_off * bbox_w
    ty = ex[CH_TMINY, :][None, :] + ty_off
    tx = ex[CH_TMINX, :][None, :] + tx_off
    tile = ty * jnp.float32(gx) + tx

    valid = owned & (local >= 0.0) & (local < ex[CH_COUNT, :][None, :])
    if tile_culling:
        # Min power response over the 16x16 tile (ops/projection.py:
        # tile_min_power_response, reference gutProjector.cuh:49-78).
        tsx, tsy = float(C.TILE_X), float(C.TILE_Y)
        cx = ex[CH_CA, :][None, :]
        cb = ex[CH_CB, :][None, :]
        cz = ex[CH_CC, :][None, :]
        mx = ex[CH_CX, :][None, :]
        my = ex[CH_CY, :][None, :]
        tminx, tminy = tsx * tx, tsy * ty
        tmaxx, tmaxy = tminx + tsx, tminy + tsy
        la_x = (tminx - mx > 0.0).astype(jnp.float32)
        la_y = (tminy - my > 0.0).astype(jnp.float32)
        nir_x = la_x + (mx > tmaxx).astype(jnp.float32)
        nir_y = la_y + (my > tmaxy).astype(jnp.float32)
        outside = (nir_x + nir_y) > 0.0
        px = tmaxx + (tminx - tmaxx) * la_x
        py = tmaxy + (tminy - tmaxy) * la_y
        dxy_x = jnp.where(tminx - mx >= 0.0, tsx, -tsx)
        dxy_y = jnp.where(tminy - my >= 0.0, tsy, -tsy)
        dfx = mx - px
        dfy = my - py
        rcp_x = 1.0 / (tsx * tsx * cx)
        rcp_y = 1.0 / (tsy * tsy * cz)
        t_x = nir_y * jnp.clip(
            (dxy_x * cx * dfx + dxy_x * cb * dfy) * rcp_x, 0.0, 1.0)
        t_y = nir_x * jnp.clip(
            (dxy_y * cb * dfx + dxy_y * cz * dfy) * rcp_y, 0.0, 1.0)
        dx = mx - (px + t_x * dxy_x)
        dy = my - (py + t_y * dxy_y)
        power = 0.5 * (cx * dx * dx + cz * dy * dy) + cb * dx * dy
        power = jnp.where(outside, power, 0.0)
        valid &= power < ex[CH_MAXPOW, :][None, :]

    # Tile-LOCAL pixel-row extent of the projected footprint, for the
    # row-termination bound (ops/tiles.row_last_touch): the extremal |dy|
    # on the level set {power == max_power} is sqrt(2 mp cx / det), padded
    # 1 px and clipped to the tile (contract: clipped-interval cover, see
    # ops/tiles.row_last_touch). Packed y0*16 + y1 — 8 bits, rides the
    # existing tile sort inside the pidx payload's top bits (free).
    e_cx = ex[CH_CA, :][None, :]
    e_cb = ex[CH_CB, :][None, :]
    e_cz = ex[CH_CC, :][None, :]
    e_det = e_cx * e_cz - e_cb * e_cb
    e_dy = jnp.where(
        e_det > 1e-12,
        jnp.sqrt(jnp.maximum(2.0 * ex[CH_MAXPOW, :][None, :] * e_cx, 0.0)
                 / jnp.maximum(e_det, 1e-12)),
        jnp.float32(1e9))
    e_cy = ex[CH_CY, :][None, :]
    ty_pix = ty * jnp.float32(C.TILE_Y)
    y0l = jnp.clip(jnp.floor(e_cy - e_dy) - 1.0 - ty_pix, 0.0, 15.0)
    y1l = jnp.clip(jnp.ceil(e_cy + e_dy) + 1.0 - ty_pix, 0.0, 15.0)
    # Unowned slots: defined full extent (matches the XLA path, whose tail
    # slots forward-fill foreign attrs; masked by the tile sentinel anyway).
    rowbits = jnp.where(owned, y0l * 16.0 + y1l, jnp.float32(15.0))

    out_ref[...] = jnp.concatenate([
        jnp.where(valid, tile, jnp.float32(num_tiles)),
        # Unowned (tail) slots get pid = N: the gather backward keys its
        # unsort on the particle id, and N sorts past every real segment
        # (sorted_gather.py — tail cotangents are zero but must not land
        # inside a particle's [ends[p-1], ends[p]) range). No depth channel:
        # expansion order is depth-ascending by construction (depth-rank
        # compaction, ops/tiles.py) and the caller's tile sort is stable.
        jnp.where(owned, ex[CH_PIDX, :][None, :],
                  jnp.float32(pid_sentinel)),
        rowbits,
        jnp.zeros((5, SBLK), jnp.float32),
    ], axis=0)


def expand_keys(
    attrs_rank: jnp.ndarray,   # [RCH, m_pad] rank-compacted channels
    ends_rank: jnp.ndarray,    # [m_pad] int32 strictly-increasing live ends
    isect_capacity: int,
    tile_grid,
    tile_culling: bool,
    pid_sentinel: int,         # pid for unowned tail slots (= N particles)
):
    """Returns (tile_key i32 [cap], pidx i32 [cap], rowbits i32 [cap]);
    tail slots (beyond the true intersection total) carry pid_sentinel.
    rowbits packs the slot's tile-local footprint row extent y0*16+y1 for
    the row-termination bound. No depth key: expansion order is
    depth-ascending (the caller rank-compacts by depth), so a stable
    tile-only sort yields (tile, depth) order."""
    gx, gy = tile_grid
    num_tiles = gx * gy
    rch, m_pad = attrs_rank.shape
    cap = isect_capacity
    assert rch == RCH and cap % SBLK == 0 and m_pad % SBLK == 0
    assert cap < (1 << 24) and m_pad < (1 << 24)
    n_win = cap // SBLK

    # First rank whose segment covers each window start; block index for the
    # two consecutive [RCH, 256] attr blocks that cover the window's <= 257
    # consecutive owning ranks.
    win_slots = jnp.arange(n_win, dtype=jnp.int32) * SBLK
    pa = jnp.searchsorted(ends_rank, win_slots, side="right")
    pa_block = jnp.minimum(pa // SBLK, m_pad // SBLK - 2).astype(jnp.int32)

    assert pid_sentinel < (1 << 24)
    kern = functools.partial(_kernel, gx=gx, num_tiles=num_tiles,
                             tile_culling=tile_culling,
                             pid_sentinel=pid_sentinel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win,),
        in_specs=[
            pl.BlockSpec((RCH, SBLK), lambda i, pa_b: (0, pa_b[i])),
            pl.BlockSpec((RCH, SBLK), lambda i, pa_b: (0, pa_b[i] + 1)),
        ],
        out_specs=pl.BlockSpec((8, SBLK), lambda i, *_: (0, i)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=tile_raster._should_interpret(),
    )(pa_block, attrs_rank, attrs_rank)
    return (out[0].astype(jnp.int32), out[1].astype(jnp.int32),
            out[2].astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pallas count-time cull-mask pass.
#
# The XLA form of cull_masks materializes [N, 64] f32 power/txy temps in HBM
# (~9 ms at N=1M just in bandwidth); this kernel evaluates the same 64-cell
# power test block-by-block in VMEM and emits only the 4 result channels.
# Layout per the tile_raster channel-major lesson: inputs [11, N], outputs
# [4, N] (counts, m0, m1, m2 as exact small ints in f32).

_CM_BLK = 2048   # particles per grid step (lanes)


def _cull_masks_kernel(in_ref, out_ref):
    tminx = in_ref[0, :][None, :]
    tminy = in_ref[1, :][None, :]
    bw = in_ref[2, :][None, :]
    bh = in_ref[3, :][None, :]
    ca = in_ref[4, :][None, :]
    cb = in_ref[5, :][None, :]
    cc = in_ref[6, :][None, :]
    mx = in_ref[7, :][None, :]
    my = in_ref[8, :][None, :]
    maxpow = in_ref[9, :][None, :]
    ntiles = in_ref[10, :][None, :]

    tsx, tsy = float(C.TILE_X), float(C.TILE_Y)
    blk = tminx.shape[1]
    # dx rides the sublane dim: [8, blk] per dy row. (Mosaic tpu.iota is
    # integer-only; build in i32 and convert.)
    ox = jax.lax.broadcasted_iota(jnp.int32, (8, blk), 0).astype(jnp.float32)
    rcp_x = 1.0 / (tsx * tsx * ca)
    rcp_y = 1.0 / (tsy * tsy * cc)

    cnt = jnp.zeros((1, blk), jnp.float32)
    w0 = jnp.zeros((1, blk), jnp.float32)
    w1 = jnp.zeros((1, blk), jnp.float32)
    w2 = jnp.zeros((1, blk), jnp.float32)
    for dy in range(8):
        tx = tminx + ox
        ty = tminy + jnp.float32(dy)
        tmin_px_x, tmin_px_y = tsx * tx, tsy * ty
        tmax_px_x, tmax_px_y = tmin_px_x + tsx, tmin_px_y + tsy
        la_x = (tmin_px_x - mx > 0.0).astype(jnp.float32)
        la_y = (tmin_px_y - my > 0.0).astype(jnp.float32)
        nir_x = la_x + (mx > tmax_px_x).astype(jnp.float32)
        nir_y = la_y + (my > tmax_px_y).astype(jnp.float32)
        outside = (nir_x + nir_y) > 0.0
        px = tmax_px_x + (tmin_px_x - tmax_px_x) * la_x
        py = tmax_px_y + (tmin_px_y - tmax_px_y) * la_y
        dxy_x = jnp.where(tmin_px_x - mx >= 0.0, tsx, -tsx)
        dxy_y = jnp.where(tmin_px_y - my >= 0.0, tsy, -tsy)
        dfx, dfy = mx - px, my - py
        t_x = nir_y * jnp.clip(
            (dxy_x * ca * dfx + dxy_x * cb * dfy) * rcp_x, 0.0, 1.0)
        t_y = nir_x * jnp.clip(
            (dxy_y * cb * dfx + dxy_y * cc * dfy) * rcp_y, 0.0, 1.0)
        dx_ = mx - (px + t_x * dxy_x)
        dy_ = my - (py + t_y * dxy_y)
        power = 0.5 * (ca * dx_ * dx_ + cc * dy_ * dy_) + cb * dx_ * dy_
        power = jnp.where(outside, power, 0.0)

        inside = (ox < bw) & (jnp.float32(dy) < bh)
        ok = inside & (power < maxpow)
        cnt = cnt + jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
        # 64-bit survival mask as 24+24+16-bit words: cell j = dy*bw + dx.
        j = (jnp.float32(dy) * bw + ox).astype(jnp.int32)
        oki = ok.astype(jnp.int32)
        for wi, (lo, wid) in enumerate(((0, 24), (24, 24), (48, 16))):
            sh = jnp.clip(j - lo, 0, 31)
            bit = jnp.where((j >= lo) & (j < lo + wid),
                            oki << sh, 0).astype(jnp.float32)
            add = jnp.sum(bit, axis=0, keepdims=True)
            if wi == 0:
                w0 = w0 + add
            elif wi == 1:
                w1 = w1 + add
            else:
                w2 = w2 + add

    live = ntiles > 0.0
    maskable = (bw <= 8.0) & (bh <= 8.0)
    keep = live & maskable
    counts = jnp.where(live, jnp.where(maskable, cnt, ntiles), 0.0)
    out_ref[...] = jnp.concatenate(
        [counts, jnp.where(keep, w0, 0.0), jnp.where(keep, w1, 0.0),
         jnp.where(keep, w2, 0.0)], axis=0)


def cull_masks_pallas(tile_min, tile_max, n_tiles, conic, center, max_power):
    """Pallas path of cull_masks (TPU, N % _CM_BLK == 0). Bit-identical
    contract with the XLA form: same power test, same word packing.

    Binning is non-differentiable by design (integer counts/masks; the XLA
    form's int outputs already block gradients) — stop_gradient here keeps
    jax.grad of a train step from trying to linearize the pallas_call."""
    n = n_tiles.shape[0]
    assert n % _CM_BLK == 0, n
    (tile_min, tile_max, n_tiles, conic, center, max_power) = (
        jax.lax.stop_gradient(
            (tile_min, tile_max, n_tiles, conic, center, max_power)))
    chans = jnp.concatenate([
        tile_min.T.astype(jnp.float32),                                # 0:2
        (tile_max[:, 0] - tile_min[:, 0])[None, :].astype(jnp.float32),
        (tile_max[:, 1] - tile_min[:, 1])[None, :].astype(jnp.float32),
        conic.T, center.T, max_power[None, :],
        n_tiles[None, :].astype(jnp.float32),
    ], axis=0)                                                         # [11, N]
    out = pl.pallas_call(
        _cull_masks_kernel,
        grid=(n // _CM_BLK,),
        in_specs=[pl.BlockSpec((11, _CM_BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((4, _CM_BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=tile_raster._should_interpret(),
    )(chans)
    return (out[0].astype(jnp.int32), out[1].astype(jnp.int32),
            out[2].astype(jnp.int32), out[3].astype(jnp.int32))
