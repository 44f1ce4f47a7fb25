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

# Channel layout of the rank-compacted attribute table [RCH, m_pad]:
CH_TMINX, CH_TMINY, CH_BBOXW, CH_COUNT, CH_DEPTH = 0, 1, 2, 3, 4
CH_CA, CH_CB, CH_CC, CH_CX, CH_CY, CH_MAXPOW = 5, 6, 7, 8, 9, 10
CH_START, CH_PIDX, CH_ONE = 11, 12, 13


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
    # Integer floor-div/mod in f32: both operands are small exact integers,
    # and correctly-rounded division cannot cross an integer boundary.
    ty_off = jnp.floor(local / bbox_w)
    tx_off = local - ty_off * bbox_w
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

    big = jnp.float32(3.4e38)
    out_ref[...] = jnp.concatenate([
        jnp.where(valid, tile, jnp.float32(num_tiles)),
        jnp.where(valid, ex[CH_DEPTH, :][None, :], big),
        # Unowned (tail) slots get pid = N: the gather backward keys its
        # unsort on the particle id, and N sorts past every real segment
        # (sorted_gather.py — tail cotangents are zero but must not land
        # inside a particle's [ends[p-1], ends[p]) range).
        jnp.where(owned, ex[CH_PIDX, :][None, :],
                  jnp.float32(pid_sentinel)),
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
    """Returns (tile_key i32 [cap], depth_key f32 [cap], pidx i32 [cap]);
    tail slots (beyond the true intersection total) carry pid_sentinel."""
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
    return (out[0].astype(jnp.int32), out[1], out[2].astype(jnp.int32))
