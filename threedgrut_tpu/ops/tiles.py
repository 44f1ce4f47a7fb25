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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from threedgrut_tpu.ops.projection import Projection, tile_min_power_response


class TileBinning(NamedTuple):
    sorted_particle_idx: jnp.ndarray  # [isect_capacity] int32 particle per slot
    sorted_tile: jnp.ndarray          # [isect_capacity] int32 tile per slot
    tile_starts: jnp.ndarray          # [num_tiles] int32
    tile_ends: jnp.ndarray            # [num_tiles] int32
    num_intersections: jnp.ndarray    # [] int32 (pre-clamp true total)
    overflow: jnp.ndarray             # [] bool — true total exceeded capacity
    perm: jnp.ndarray                 # [isect_capacity] int32 expansion slot
                                      # at each sorted position
    particle_ends: jnp.ndarray        # [N] int32 cumsum of per-particle counts
    particle_counts: jnp.ndarray      # [N] int32


def bin_particles(
    proj: Projection,
    tile_grid: Tuple[int, int],
    isect_capacity: int,
    tile_culling: bool = True,
) -> TileBinning:
    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.depth.shape[0]
    cap = isect_capacity

    counts = proj.n_tiles.astype(jnp.int32)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    overflow = total > cap
    starts = ends - counts

    # Slot ownership via scatter + cummax (see module docstring). Slots past
    # the last range keep the last particle and fail the local < count test.
    has = counts > 0
    scatter_to = jnp.where(has, starts, cap)
    marker = jnp.zeros((cap, 2), jnp.int32).at[scatter_to].max(
        jnp.stack([jnp.arange(n, dtype=jnp.int32), starts], axis=-1),
        mode="drop")
    filled = jax.lax.cummax(marker, axis=0)
    pidx_c = filled[:, 0]
    start_of = filled[:, 1]
    slot = jnp.arange(cap, dtype=jnp.int32)
    local = slot - start_of

    # One packed gather of every per-slot attribute.
    attrs = jnp.concatenate([
        proj.tile_min.astype(jnp.float32),                      # 0:2
        (proj.tile_max[:, 0] - proj.tile_min[:, 0])[:, None]
        .astype(jnp.float32),                                   # 2 bbox_w
        counts[:, None].astype(jnp.float32),                    # 3
        proj.depth[:, None],                                    # 4
        proj.conic,                                             # 5:8
        proj.center,                                            # 8:10
        proj.max_power[:, None],                                # 10
    ], axis=-1)                                                 # [N, 11]
    a = attrs[pidx_c]                                           # [cap, 11]

    bbox_w = jnp.maximum(a[:, 2].astype(jnp.int32), 1)
    ty = a[:, 1].astype(jnp.int32) + local // bbox_w
    tx = a[:, 0].astype(jnp.int32) + local % bbox_w
    tile = ty * gx + tx

    valid = (local >= 0) & (local < a[:, 3].astype(jnp.int32))
    if tile_culling:
        tile_xy = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)
        power = tile_min_power_response(tile_xy, a[:, 5:8], a[:, 8:10])
        valid &= power < a[:, 10]

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    tile_key = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, a[:, 4], big)

    sorted_tile, _, sorted_idx, perm = jax.lax.sort(
        (tile_key, depth_key, pidx_c, slot), num_keys=2)

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
        perm=perm,
        particle_ends=ends,
        particle_counts=counts,
    )
