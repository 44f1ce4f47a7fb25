"""Frame-coherent inference: temporal hit-visibility compaction (+ optional
frozen binning) for interactive / video rendering.

The training renderer rebuilds projection + binning + sort + gather from
scratch every frame; the reference instead amortizes acceleration-structure
work across frames (BVH refit policy, threedgrt_tracer/tracer.py:190-208
`max_consecutive_bvh_update`) and its eval FPS column reflects that. The
TPU-native analogue here exploits FRAME COHERENCE two ways:

  1. `compact_visible` — a REFRESH frame renders exactly with
     `hit_visibility=True` (the kernel's contributed bit, an exact census:
     only ~1/3 of particles contribute at converged scenes — RESULTS.md
     oracle); subsequent frames render only the compacted contributing set
     at a proportionally smaller isect capacity. Every capacity- and
     N-proportional stage (projection, rank sort, expansion, pair sort,
     gathers, kernel walk) shrinks by the visible fraction.
  2. `FrozenBinning` — between refreshes the binning products (sorted slot
     ids + tile ranges) can be reused verbatim: the kernel evaluates the
     EXACT 3D ray-space response from world-space particle rows, so a stale
     binning only affects tile-list membership and compositing order, both
     of which drift slowly under small camera deltas (the per-ray
     `sorted_passes` re-sort absorbs bounded order drift — the same
     mechanism that makes the sorted preset exact under bounded
     displacement).

Both are approximations ACROSS frames (exact at the refresh camera);
tools/bench_infer_orbit.py measures the error against the exact per-frame
path and RESULTS.md records the speed/parity trade. Use refresh_every to
bound drift.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import Camera, SensorPose, ShutterType
from threedgrut_tpu.render import gut
from threedgrut_tpu.render.gut_reference import RenderOutputs


class CompactScene(NamedTuple):
    """Hit-visible subset of a Gaussian mixture, compacted to a static
    capacity. Tail rows carry opacity 0 (projector-invalid, never binned)."""
    positions: jnp.ndarray   # [Nc, 3]
    quats: jnp.ndarray       # [Nc, 4]
    scales: jnp.ndarray      # [Nc, 3]
    opacities: jnp.ndarray   # [Nc]
    features: jnp.ndarray    # [Nc, K, 3]
    src_idx: jnp.ndarray     # [Nc] int32 source particle id (tail: N)
    count: jnp.ndarray       # [] int32 true visible count
    overflow: jnp.ndarray    # [] bool — visible count exceeded Nc


def compact_visible(positions, quats, scales, opacities, features,
                    visibility, n_compact: int) -> CompactScene:
    """Gather the `visibility`-marked particles into a [n_compact] scene.

    Stable compaction (ascending source id) via one 2-operand sort — the
    same idiom as the tile binning's rank compaction. If more than
    `n_compact` particles are visible the tail is dropped and `overflow`
    set (callers grow and re-refresh, like isect capacity)."""
    n = positions.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(visibility, idx, n + idx)      # visible first, id order
    key_sorted = jax.lax.sort((key,))[0][:n_compact]
    src = jnp.where(key_sorted < n, key_sorted, n)
    count = jnp.sum(visibility.astype(jnp.int32))
    overflow = count > n_compact
    srcc = jnp.minimum(src, n - 1)
    live = src < n
    return CompactScene(
        positions=positions[srcc],
        quats=quats[srcc],
        scales=scales[srcc],
        opacities=jnp.where(live, opacities[srcc], 0.0),
        features=features[srcc],
        src_idx=src,
        count=count,
        overflow=overflow,
    )


def refresh(positions, quats, scales, opacities, features, cam: Camera,
            pose: SensorPose, resolution, isect_capacity: int,
            n_compact: int, shutter: ShutterType = ShutterType.GLOBAL,
            sh_degree: int = 3, sorted_passes: int = 0,
            T_to_world=None,
            visibility_threshold: float = 0.0
            ) -> Tuple[RenderOutputs, jnp.ndarray, CompactScene]:
    """Exact render + hit-visibility census + compaction, in one jittable
    call. Returns (outputs, isect_overflow, CompactScene).

    `visibility_threshold` > 0 drops particles whose best per-tile
    composite weight never exceeded it (bounded extra image error in the
    frames rendered from the compacted scene; 0.0 keeps every contributing
    particle)."""
    out, ovf = gut.render(
        positions, quats, scales, opacities, features, cam, pose,
        resolution, isect_capacity, shutter=shutter, sh_degree=sh_degree,
        sorted_passes=sorted_passes, T_to_world=T_to_world,
        hit_visibility=True, aux_gradients=False,
        visibility_threshold=visibility_threshold)
    scene = compact_visible(positions, quats, scales, opacities, features,
                            out.visibility, n_compact)
    return out, ovf, scene


class FrozenBinning(NamedTuple):
    """Binning products captured at a refresh camera for reuse (mode
    'frozen'): the per-slot particle ids and tile ranges of the compacted
    scene's binning."""
    sorted_idx: jnp.ndarray     # [capc] int32 (compact-scene particle ids)
    particle_ends: jnp.ndarray  # [Nc] int32
    tile_starts: jnp.ndarray    # [num_tiles] int32
    tile_ends: jnp.ndarray      # [num_tiles] int32
    overflow: jnp.ndarray       # [] bool


def capture_binning(scene: CompactScene, cam: Camera, pose: SensorPose,
                    resolution, isect_capacity: int,
                    shutter: ShutterType = ShutterType.GLOBAL
                    ) -> FrozenBinning:
    """Project + bin the compacted scene once, keeping only the reusable
    products."""
    proj, binning, _, _ = gut.prepare_packed(
        scene.positions, scene.quats, scene.scales, scene.opacities,
        scene.features, cam, pose, resolution, isect_capacity, shutter,
        sh_degree=0)
    return FrozenBinning(
        sorted_idx=binning.sorted_particle_idx,
        particle_ends=binning.particle_ends,
        tile_starts=binning.tile_starts,
        tile_ends=binning.tile_ends,
        overflow=binning.overflow,
    )


def render_compact(scene: CompactScene, cam: Camera, pose: SensorPose,
                   resolution, isect_capacity: int,
                   shutter: ShutterType = ShutterType.GLOBAL,
                   sh_degree: int = 3, sorted_passes: int = 0,
                   T_to_world=None,
                   aux_outputs: bool = False
                   ) -> Tuple[RenderOutputs, jnp.ndarray]:
    """Mode 'compact': full per-frame pipeline over the compacted scene
    (exact for the visible set; error only from particles that became
    visible since the refresh). `aux_outputs=True` keeps the depth /
    hit-count channels (viewer depth/density panels)."""
    return gut.render(
        scene.positions, scene.quats, scene.scales, scene.opacities,
        scene.features, cam, pose, resolution, isect_capacity,
        shutter=shutter, sh_degree=sh_degree, sorted_passes=sorted_passes,
        T_to_world=T_to_world, aux_gradients=False,
        aux_outputs=aux_outputs)


def render_frozen(scene: CompactScene, frozen: FrozenBinning, cam: Camera,
                  pose: SensorPose, resolution,
                  sh_degree: int = 3, sorted_passes: int = 16,
                  T_to_world=None,
                  kernel_degree: int = C.KERNEL_DEGREE_3DGUT,
                  min_transmittance: float = C.MIN_TRANSMITTANCE_3DGUT
                  ) -> RenderOutputs:
    """Mode 'frozen': reuse the refresh frame's binning verbatim; only
    repack rows (view-dependent SH colors), gather, and walk the kernel.

    The kernel's response math is exact in world space, so the staleness
    is (a) tile-list membership drift and (b) compositing-order drift;
    `sorted_passes` (default 16, the k-buffer machinery) absorbs bounded
    order drift. Exact at the refresh camera itself."""
    from threedgrut_tpu.ops.pallas import tile_raster
    from threedgrut_tpu.ops.sorted_gather import sorted_gather
    from threedgrut_tpu.render.gut_reference import (camera_center_world,
                                                     precomputed_features)
    w, h = resolution
    wp, hp = gut.pad_to_tiles(resolution)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)

    cam_center = camera_center_world(pose)
    colors = precomputed_features(scene.positions, scene.features,
                                  cam_center, sh_degree)
    packed = gut.pack_particles(scene.positions, scene.quats, scene.scales,
                                scene.opacities, colors)
    counts = jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                       frozen.particle_ends]))
    data_sorted = sorted_gather(packed, frozen.sorted_idx,
                                frozen.particle_ends, counts, "f32")
    rays = gut.packed_world_rays(cam, pose, tile_grid, T_to_world,
                                 shutter=ShutterType.GLOBAL)
    out = tile_raster.tile_composite(
        data_sorted, frozen.tile_starts, frozen.tile_ends, rays,
        kernel_degree, min_transmittance, sorted_passes=sorted_passes,
        has_t_max=False, aux_grads=False, aux_outputs=False)
    img = gut.tile_unpack(out, tile_grid)[:h, :w]
    return RenderOutputs(
        rgb=img[..., 0:3], opacity=img[..., 3], depth=img[..., 4],
        transmittance=img[..., 5], hit_count=img[..., 6],
        visibility=jnp.zeros((scene.positions.shape[0],), bool))
