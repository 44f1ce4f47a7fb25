"""Tile binning: expansion of particle->tile intersections, sort, tile ranges.

TPU-native replacement for the reference's CUB pipeline
(threedgut_tracer/src/gutRenderer.cu:241-398: projectOnTiles -> InclusiveSum ->
D2H total readback -> expandTileProjections -> DeviceRadixSort -> range kernel).

Differences by design:
  * No device->host readback: intersections live in a static-capacity buffer
    `isect_capacity` with an overflow count returned for host-side monitoring.
  * No scatter in expansion; slot -> particle ownership is computed by
    scattering each particle's index at its first slot and taking a cumulative
    max — ownership is contiguous and ascending, so cummax forward-fills it.
    (A searchsorted over the cumsum is mathematically identical but ~14x
    slower on TPU: binary-search gathers vs one bandwidth-bound scan.)
  * All per-slot particle attributes are fetched with ONE packed gather
    (TPU gathers cost ~the same per row regardless of row width; eight
    separate gathers were ~8x the traffic in dispatch terms).
  * Per-tile power-response culling marks slots with a sentinel tile id that
    sorts past every real tile (the reference emits the same pairs compacted;
    rendering semantics are identical because culled pairs never render).
  * Sort is a lexicographic (tile, depth) `lax.sort` — deterministic, exact
    float depth ordering (no key quantization).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.ops.projection import Projection, tile_min_power_response


class TileBinning(NamedTuple):
    sorted_particle_idx: jnp.ndarray  # [isect_capacity] int32 particle per
                                      # slot; tail slots (beyond the true
                                      # total) carry N (sorts past every real
                                      # particle in the gather backward)
    sorted_tile: jnp.ndarray          # [isect_capacity] int32 tile per slot
    tile_starts: jnp.ndarray          # [num_tiles] int32
    tile_ends: jnp.ndarray            # [num_tiles] int32
    num_intersections: jnp.ndarray    # [] int32 (pre-clamp true total)
    overflow: jnp.ndarray             # [] bool — true total exceeded capacity
    particle_ends: jnp.ndarray        # [N] int32 cumsum of per-particle counts
    particle_counts: jnp.ndarray      # [N] int32
    # Per-slot tile-local footprint row extent y0*16+y1 (8 bits; the
    # row-termination bound's input — see row_last_touch). Computed by the
    # expansion for free and carried through the tile sort packed into the
    # pid payload's top bits.
    sorted_rowbits: Optional[jnp.ndarray] = None


def bin_particles(
    proj: Projection,
    tile_grid: Tuple[int, int],
    isect_capacity: int,
    tile_culling: bool = True,
) -> TileBinning:
    # The Pallas expansion runs on real TPU only: in interpret mode (CPU
    # tests, the CPU leg of tools/tpu_vs_cpu_check.py) the XLA path is the
    # oracle and ~100x faster than emulated DMA. Outputs are exact-equal
    # (tests/test_binning.py pins the kernel contract in interpret mode at
    # small shapes). THREEDGRUT_BIN=xla forces the XLA path for bisection.
    import os
    from threedgrut_tpu.ops.pallas import tile_raster
    if (isect_capacity % 256 == 0
            and not tile_raster._should_interpret()
            and os.environ.get("THREEDGRUT_BIN", "pallas") != "xla"):
        return _bin_particles_pallas(proj, tile_grid, isect_capacity,
                                     tile_culling)
    return _bin_particles_xla(proj, tile_grid, isect_capacity, tile_culling)


def _bin_particles_pallas(
    proj: Projection,
    tile_grid: Tuple[int, int],
    isect_capacity: int,
    tile_culling: bool = True,
) -> TileBinning:
    """Expansion + key math in one Pallas pass (ops/pallas/expand.py); the
    only remaining per-row XLA stages are one 2-operand rank sort, one
    1M-row compaction gather, and the final lexicographic pair sort."""
    from threedgrut_tpu.ops.pallas import expand as ex

    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.depth.shape[0]
    cap = isect_capacity

    # Count-time per-tile culling (expand.cull_masks): counts reflect only
    # SURVIVING cells for maskable particles, so culled pairs never consume
    # intersection capacity.
    counts, m0, m1, m2 = ex.cull_masks(
        proj.tile_min, proj.tile_max, proj.n_tiles, proj.conic, proj.center,
        proj.max_power, tile_culling)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    overflow = total > cap

    # Compact live particles by DEPTH rank (stable 2-operand sort; dead
    # particles key to +max and land in a contiguous tail). Two birds: the
    # compaction bounds every 256-slot window's owners to <= 257 consecutive
    # ranks (see expand.py docstring), and because expansion order is now
    # depth-ascending, the big (tile, depth) lex sort below needs NO depth
    # operand at all — a stable sort on the tile key alone preserves the
    # per-tile depth order. (The reference pays for depth with a 64-bit
    # radix key, gutRenderer.cu concatTileDepthKeys; here it is free.)
    has = counts > 0
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    rank_key = jnp.where(has, proj.depth, big)
    _, ids_of_rank = jax.lax.sort((rank_key, idx), num_keys=1)

    attrs = jnp.concatenate([
        proj.tile_min.astype(jnp.float32),                      # 0:2
        (proj.tile_max[:, 0] - proj.tile_min[:, 0])[:, None]
        .astype(jnp.float32),                                   # 2 bbox_w
        counts[:, None].astype(jnp.float32),                    # 3
        m0[:, None].astype(jnp.float32),                        # 4 mask 0:24
        proj.conic,                                             # 5:8
        proj.center,                                            # 8:10
        proj.max_power[:, None],                                # 10
        m1[:, None].astype(jnp.float32),                        # 11 mask 24:48
        m2[:, None].astype(jnp.float32),                        # 12 mask 48:64
    ], axis=-1)                                                 # [N, 13]
    # Barrier: materialize before the gather so XLA row-dispatches instead
    # of fusing the concat producers per-element (see grt.py r5 finding).
    a_rank = jax.lax.optimization_barrier(attrs)[ids_of_rank]   # [m, 13]
    counts_rank = a_rank[:, 3].astype(jnp.int32)
    ends_rank = jnp.cumsum(counts_rank)
    starts_rank = (ends_rank - counts_rank).astype(jnp.float32)
    a_rank = jnp.concatenate([
        a_rank,
        starts_rank[:, None],                                   # 13 start
        ids_of_rank.astype(jnp.float32)[:, None],               # 14 pidx
        jnp.ones((n, 1), jnp.float32),                          # 15 owned
    ], axis=-1)                                                 # [N, 16]

    m_pad = max(512, -(-n // 256) * 256)
    if m_pad != n:
        a_rank = jnp.concatenate(
            [a_rank, jnp.zeros((m_pad - n, 16), jnp.float32)])
        ends_rank = jnp.concatenate(
            [ends_rank, jnp.broadcast_to(ends_rank[-1:], (m_pad - n,))])

    # Binning is a discrete structure decision: no gradient flows through
    # the sort keys (the reference's CUB pipeline likewise sits outside
    # autodiff), and pallas_call has no JVP rule to trace through.
    tile_key, pidx_c, rowbits = ex.expand_keys(
        jax.lax.stop_gradient(a_rank.T), ends_rank.astype(jnp.int32),
        cap, tile_grid, tile_culling, pid_sentinel=n)

    # 2-operand STABLE sort on the tile key alone: expansion order is depth-
    # ascending (rank compaction above), so stability gives per-tile depth
    # order for free. The gather backward unsorts by PARTICLE ID (stable, so
    # segments are the same [ends[p-1], ends[p]) ranges) — no expansion-slot
    # permutation operand needed (ops/sorted_gather.py). The 8-bit footprint
    # row extent rides in the pid PAYLOAD's top bits — payload bits never
    # affect a num_keys=1 sort's order, so this costs no extra operand.
    packed = pidx_c | (rowbits << 24)
    sorted_tile, sorted_packed = jax.lax.sort((tile_key, packed), num_keys=1)
    sorted_idx = sorted_packed & 0x00FFFFFF
    sorted_rowbits = (sorted_packed >> 24) & 0xFF

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tstarts = jnp.searchsorted(sorted_tile, tiles, side="left").astype(jnp.int32)
    tends = jnp.searchsorted(sorted_tile, tiles, side="right").astype(jnp.int32)

    return TileBinning(
        sorted_particle_idx=sorted_idx,
        sorted_tile=sorted_tile,
        tile_starts=tstarts,
        tile_ends=tends,
        num_intersections=total,
        overflow=overflow,
        particle_ends=ends,
        particle_counts=counts,
        sorted_rowbits=sorted_rowbits,
    )


def particle_row_extent(proj) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-particle global pixel-row interval [py0, py1] of the projected
    footprint {power <= max_power} (same conic/max_power as the tile cull,
    reference gutProjector.cuh:49-116). For power = 0.5(cx dx^2 + cz dy^2)
    + cb dx dy, the extremal |dy| on the level set is
    sqrt(2 mp cx / (cx cz - cb^2)); padded by 1 px against fp slack."""
    cx, cb, cz = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    det = cx * cz - cb * cb
    safe = det > 1e-12
    dy = jnp.sqrt(jnp.maximum(2.0 * proj.max_power * cx, 0.0)
                  / jnp.where(safe, det, 1.0))
    dy = jnp.where(safe, dy, jnp.float32(1e9))
    cy = proj.center[:, 1]
    return jnp.floor(cy - dy) - 1.0, jnp.ceil(cy + dy) + 1.0


def row_last_touch(binning: TileBinning, proj, tile_grid) -> jnp.ndarray:
    """Per-pixel LAST-TOUCH slot bound for the kernel's row-termination mode
    (rays row 7): lt[t, p] = index of the last sorted slot whose projected
    footprint reaches pixel p's tile row, or -1. Pixels composite only slots
    <= their bound and the window walk stops once every pixel is saturated
    or past it (ops/pallas/tile_raster.py row_termination).

    Segmented max over each tile's contiguous slot range, done blockwise to
    avoid a big scatter: 256-slot blocks reduce with reshapes; a block's
    slots split between its first/last tile handle the boundaries; interior
    (single-tile) blocks scatter-max at block granularity (~cap/256 rows).
    Tiles whose whole segment sits strictly inside a foreign-owned block
    fall back to their exact end (<= 2 windows, no loss)."""
    gx, gy = tile_grid
    num_tiles = gx * gy
    cap = binning.sorted_particle_idx.shape[0]
    n = proj.depth.shape[0]
    tile = binning.sorted_tile
    if binning.sorted_rowbits is not None:
        # Fast path: the expansion computed the clipped tile-local extent
        # and the tile sort carried it for free (pid payload top bits).
        rb = binning.sorted_rowbits
        y0 = (rb // 16).astype(jnp.float32)
        y1 = (rb % 16).astype(jnp.float32)
    else:
        # Fallback (tests/oracle): one 2-channel per-slot gather.
        py0, py1 = particle_row_extent(proj)
        pid = binning.sorted_particle_idx
        pidc = jnp.minimum(pid, n - 1)
        ext = jnp.stack([py0, py1], axis=-1)[pidc]
        ty = (jnp.minimum(tile, num_tiles - 1) // gx).astype(jnp.float32)
        y0 = jnp.clip(ext[:, 0] - ty * 16.0, 0.0, 15.0)
        y1 = jnp.clip(ext[:, 1] - ty * 16.0, 0.0, 15.0)
    real = tile < num_tiles                              # tail/culled slots
    r = jnp.arange(16, dtype=jnp.float32)
    slotf = jnp.arange(cap, dtype=jnp.float32)
    cover = (y0[:, None] <= r) & (r <= y1[:, None]) & real[:, None]
    f = jnp.where(cover, slotf[:, None], -1.0)           # [cap, 16]

    B = 256
    nb = cap // B
    fb = f.reshape(nb, B, 16)
    tb = tile.reshape(nb, B)
    first_t, last_t = tb[:, 0], tb[:, -1]
    bm = jnp.max(fb, axis=1)                             # [nb, 16]
    lo = jnp.max(jnp.where((tb == first_t[:, None])[..., None], fb, -1.0),
                 axis=1)
    hi = jnp.max(jnp.where((tb == last_t[:, None])[..., None], fb, -1.0),
                 axis=1)
    owner = jnp.where(first_t == last_t, first_t, num_tiles)
    interior = jax.ops.segment_max(bm, owner, num_segments=num_tiles + 1)
    interior = jnp.maximum(interior[:num_tiles], -1.0)   # empty -> -inf

    s, e = binning.tile_starts, binning.tile_ends
    has_any = e > s
    b0 = jnp.where(has_any, s // B, 0)
    b1 = jnp.where(has_any, jnp.maximum(e - 1, 0) // B, 0)
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    cand_hi = jnp.where((last_t[b0] == tid)[:, None], hi[b0], -1.0)
    cand_lo = jnp.where((first_t[b1] == tid)[:, None], lo[b1], -1.0)
    lt = jnp.maximum(jnp.maximum(interior, cand_hi), cand_lo)
    fb_needed = (has_any & (b0 == b1)
                 & (first_t[b0] != tid) & (last_t[b0] != tid))
    lt = jnp.where(fb_needed[:, None], (e - 1)[:, None].astype(jnp.float32),
                   lt)
    lt = jnp.where(has_any[:, None], lt, -1.0)
    return jnp.repeat(lt, 16, axis=1)                    # [num_tiles, 256]


def _bin_particles_xla(
    proj: Projection,
    tile_grid: Tuple[int, int],
    isect_capacity: int,
    tile_culling: bool = True,
) -> TileBinning:
    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.depth.shape[0]
    cap = isect_capacity

    from threedgrut_tpu.ops.pallas import expand as ex

    counts, m0, m1, m2 = ex.cull_masks(
        proj.tile_min, proj.tile_max, proj.n_tiles, proj.conic, proj.center,
        proj.max_power, tile_culling)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    overflow = total > cap

    # Depth-rank compaction, exactly as the Pallas path: live particles in
    # depth order form a contiguous prefix, so expansion order is depth-
    # ascending and the final sort is a stable tile-only sort.
    has = counts > 0
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    rank_key = jnp.where(has, proj.depth, big)
    _, ids_of_rank = jax.lax.sort((rank_key, idx), num_keys=1)

    attrs = jnp.concatenate([
        proj.tile_min.astype(jnp.float32),                      # 0:2
        (proj.tile_max[:, 0] - proj.tile_min[:, 0])[:, None]
        .astype(jnp.float32),                                   # 2 bbox_w
        counts[:, None].astype(jnp.float32),                    # 3
        m0[:, None].astype(jnp.float32),                        # 4
        proj.conic,                                             # 5:8
        proj.center,                                            # 8:10
        proj.max_power[:, None],                                # 10
        idx[:, None].astype(jnp.float32),                       # 11 pidx
        m1[:, None].astype(jnp.float32),                        # 12
        m2[:, None].astype(jnp.float32),                        # 13
    ], axis=-1)                                                 # [N, 14]
    a_rank = attrs[ids_of_rank]                                 # [N, 14]
    counts_rank = a_rank[:, 3].astype(jnp.int32)
    ends_rank = jnp.cumsum(counts_rank)
    starts_rank = ends_rank - counts_rank

    # Slot ownership (see module docstring): forward-fill the owning RANK
    # and its segment start from each rank's first slot. Live ranks are a
    # contiguous prefix, so the deltas vs the previous rank are simply 1 and
    # counts_rank[r-1]. Expressed as a cumsum of DELTAS in f32 — values stay
    # below 2^24 so every partial sum is exact, and a 2-channel f32 cumsum
    # over [cap] is ~20x cheaper on TPU than an int32 cummax formulation
    # (measured 44.8 -> ~6 ms at cap=3.4M).
    has_rank = counts_rank > 0
    d_rank = jnp.where(idx > 0, 1.0, 0.0)
    d_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), counts_rank[:-1]]).astype(jnp.float32)
    scatter_to = jnp.where(has_rank, starts_rank, cap)
    buf = jnp.zeros((cap, 2), jnp.float32).at[scatter_to].set(
        jnp.stack([d_rank, d_start], axis=-1), mode="drop")
    from threedgrut_tpu.ops.sorted_gather import _blocked_cumsum
    filled = _blocked_cumsum(buf)
    rank_c = filled[:, 0].astype(jnp.int32)
    start_of = filled[:, 1].astype(jnp.int32)
    slot = jnp.arange(cap, dtype=jnp.int32)
    local = slot - start_of

    # One packed gather of every per-slot attribute.
    a = a_rank[rank_c]                                          # [cap, 14]
    pidx_c = a[:, 11].astype(jnp.int32)

    # Local index -> surviving bbox cell (identity for non-maskable rows,
    # whose mask words are zero) — mirrors the Pallas expansion kernel.
    am0 = a[:, 4].astype(jnp.int32)
    am1 = a[:, 12].astype(jnp.int32)
    am2 = a[:, 13].astype(jnp.int32)
    sel = ex.select_nth_set_bit(am0, am1, am2, jnp.maximum(local, 0))
    cell = jnp.where((am0 | am1 | am2) == 0, local, sel)

    bbox_w = jnp.maximum(a[:, 2].astype(jnp.int32), 1)
    ty = a[:, 1].astype(jnp.int32) + cell // bbox_w
    tx = a[:, 0].astype(jnp.int32) + cell % bbox_w
    tile = ty * gx + tx

    owned = (local >= 0) & (local < a[:, 3].astype(jnp.int32))
    valid = owned
    if tile_culling:
        tile_xy = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)
        power = tile_min_power_response(tile_xy, a[:, 5:8], a[:, 8:10])
        valid &= power < a[:, 10]

    tile_key = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    # Tail slots (not owned by any particle) sort with pid = N so the gather
    # backward's particle-id unsort keeps them past every real segment;
    # culled-but-owned slots keep their pid (their counts include them, and
    # their cotangents are zero).
    pid_key = jnp.where(owned, pidx_c, n)

    # Tile-local footprint row extent (the Pallas expansion's rowbits
    # channel, same formula/contract — see expand._kernel): rides the sort
    # in the payload's top 8 bits. Unowned slots carry the defined full
    # extent 0..15 (masked by the tile sentinel downstream).
    s_cx, s_cb, s_cz = a[:, 5], a[:, 6], a[:, 7]
    s_det = s_cx * s_cz - s_cb * s_cb
    s_dy = jnp.where(
        s_det > 1e-12,
        jnp.sqrt(jnp.maximum(2.0 * a[:, 10] * s_cx, 0.0)
                 / jnp.maximum(s_det, 1e-12)),
        jnp.float32(1e9))
    s_cy = a[:, 9]
    ty_pix = ty.astype(jnp.float32) * jnp.float32(C.TILE_Y)
    y0l = jnp.clip(jnp.floor(s_cy - s_dy) - 1.0 - ty_pix, 0.0, 15.0)
    y1l = jnp.clip(jnp.ceil(s_cy + s_dy) + 1.0 - ty_pix, 0.0, 15.0)
    rowbits = jnp.where(owned, (y0l * 16.0 + y1l).astype(jnp.int32), 15)

    packed = pid_key | (rowbits << 24)
    sorted_tile, sorted_packed = jax.lax.sort((tile_key, packed), num_keys=1)
    sorted_idx = sorted_packed & 0x00FFFFFF
    sorted_rowbits = (sorted_packed >> 24) & 0xFF

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tstarts = jnp.searchsorted(sorted_tile, tiles, side="left").astype(jnp.int32)
    tends = jnp.searchsorted(sorted_tile, tiles, side="right").astype(jnp.int32)

    return TileBinning(
        sorted_particle_idx=sorted_idx,
        sorted_tile=sorted_tile,
        tile_starts=tstarts,
        tile_ends=tends,
        num_intersections=total,
        overflow=overflow,
        particle_ends=ends,
        particle_counts=counts,
        sorted_rowbits=sorted_rowbits,
    )
