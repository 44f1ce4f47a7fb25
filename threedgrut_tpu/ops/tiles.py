"""Tile binning: expansion of particle->tile intersections, sort, tile ranges.

TPU-native replacement for the reference's CUB pipeline
(threedgut_tracer/src/gutRenderer.cu:241-398: projectOnTiles -> InclusiveSum ->
D2H total readback -> expandTileProjections -> DeviceRadixSort -> range kernel).

Differences by design:
  * No device->host readback: intersections live in a static-capacity buffer
    `isect_capacity` with an overflow count returned for host-side monitoring.
  * No scatter in expansion: slot -> particle assignment is computed with a
    searchsorted over the inclusive cumsum of per-particle tile counts, so a
    particle may span arbitrarily many tiles with no per-particle cap.
  * Per-tile power-response culling marks slots with a sentinel tile id that
    sorts past every real tile (the reference emits the same pairs compacted;
    rendering semantics are identical because culled pairs never render).
  * Sort is a lexicographic (tile, depth) `lax.sort` — deterministic.
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


def bin_particles(
    proj: Projection,
    tile_grid: Tuple[int, int],
    isect_capacity: int,
    tile_culling: bool = True,
) -> TileBinning:
    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.depth.shape[0]

    counts = proj.n_tiles.astype(jnp.int32)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    overflow = total > isect_capacity

    slot = jnp.arange(isect_capacity, dtype=jnp.int32)
    # First particle whose inclusive cumsum exceeds the slot index; zero-count
    # particles are skipped automatically.
    pidx = jnp.searchsorted(ends, slot, side="right").astype(jnp.int32)
    in_range = pidx < n
    pidx_c = jnp.minimum(pidx, n - 1)
    local = slot - (ends[pidx_c] - counts[pidx_c])

    bbox_w = jnp.maximum(
        proj.tile_max[pidx_c, 0] - proj.tile_min[pidx_c, 0], 1)
    ty = proj.tile_min[pidx_c, 1] + local // bbox_w
    tx = proj.tile_min[pidx_c, 0] + local % bbox_w
    tile = ty * gx + tx

    valid = in_range & (local >= 0) & (local < counts[pidx_c])
    if tile_culling:
        tile_xy = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)
        power = tile_min_power_response(
            tile_xy, proj.conic[pidx_c], proj.center[pidx_c])
        valid &= power < proj.max_power[pidx_c]

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    tile_key = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, proj.depth[pidx_c], big)

    sorted_tile, _, sorted_idx = jax.lax.sort(
        (tile_key, depth_key, pidx_c), num_keys=2)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tiles, side="left").astype(jnp.int32)
    tends = jnp.searchsorted(sorted_tile, tiles, side="right").astype(jnp.int32)

    return TileBinning(
        sorted_particle_idx=sorted_idx,
        sorted_tile=sorted_tile,
        tile_starts=starts,
        tile_ends=tends,
        num_intersections=total,
        overflow=overflow,
    )
