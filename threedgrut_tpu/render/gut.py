"""Fast 3DGUT renderer: UT projection -> tile binning/sort -> Pallas compositor.

The end-to-end differentiable fast path. Projection, packing and SH color are
plain jnp (JAX autodiff); only the tile compositing walk is a hand-written
Pallas custom_vjp whose residuals are the sorted lists — mirroring the
reference's two-phase design where the backward reuses the forward's sorted
tile buffers (gutRenderer.cu:413-417).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import Camera, SensorPose, ShutterType
from threedgrut_tpu.ops import projection as proj_ops
from threedgrut_tpu.ops import quaternion
from threedgrut_tpu.ops import tiles as tile_ops
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.render.gut_reference import (
    RenderOutputs,
    camera_center_world,
    camera_space_rays,
    precomputed_features,
)


@jax.custom_vjp
def _eval_only_guard(x, anchor):
    """Identity on `x` whose backward REFUSES to trace.

    `render(hit_visibility=True)` has no VJP (the kernel's contributed-bit
    leg stop-gradients its inputs; training derives the same bit from
    nonzero grads, trainer.py). The compute path through the kernel is
    already severed, so a caller differentiating the outputs would silently
    get zero gradients — `anchor` re-ties the outputs to the differentiable
    inputs through THIS op only, so jax.grad raises at trace time instead.
    """
    del anchor
    return x


def _eval_only_guard_fwd(x, anchor):
    del anchor
    return x, None


def _eval_only_guard_bwd(_, g):
    raise ValueError(
        "gut.render(hit_visibility=True) is eval-only and cannot be "
        "differentiated: the hit-based visibility leg stops gradients "
        "through the compositor. For training, use hit_visibility=False; "
        "the trainer derives the same contributed bit from nonzero "
        "parameter gradients (see Trainer._step)."
    )


_eval_only_guard.defvjp(_eval_only_guard_fwd, _eval_only_guard_bwd)


def pad_to_tiles(resolution: Tuple[int, int]) -> Tuple[int, int]:
    w, h = resolution
    return (-(-w // C.TILE_X) * C.TILE_X, -(-h // C.TILE_Y) * C.TILE_Y)


def tile_pack(img: jnp.ndarray, tile_grid: Tuple[int, int]) -> jnp.ndarray:
    """[H, W, c] -> [num_tiles, c, 256] (row-major pixels within a tile)."""
    gx, gy = tile_grid
    c = img.shape[-1]
    x = img.reshape(gy, C.TILE_Y, gx, C.TILE_X, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(gx * gy, C.TILE_SIZE, c)
    return x.transpose(0, 2, 1)


def tile_unpack(buf: jnp.ndarray, tile_grid: Tuple[int, int]) -> jnp.ndarray:
    """[num_tiles, c, 256] -> [H, W, c]."""
    gx, gy = tile_grid
    c = buf.shape[1]
    x = buf.transpose(0, 2, 1).reshape(gy, gx, C.TILE_Y, C.TILE_X, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(gy * C.TILE_Y, gx * C.TILE_X, c)


def pack_particles(positions, quats, scales, opacities, colors) -> jnp.ndarray:
    """Pack per-particle data into 16-float rows for the Pallas compositor.

    A = diag(1/scale) R^T (world -> canonical incl. scales); colors are the
    use-time-clamped precomputed SH radiance (max(c, 0), matching
    gutKBufferRenderer.cuh:160-165).
    """
    R = quaternion.to_rotation_matrix(quats)          # [N, 3, 3]
    A = jnp.swapaxes(R, -1, -2) / scales[..., :, None]
    return jnp.concatenate([
        A.reshape(-1, 9),
        positions,
        opacities[..., None],
        jnp.maximum(colors, 0.0),
    ], axis=-1)


def prepare_packed(
    positions, quats, scales, opacities, features, cam, pose,
    resolution, isect_capacity, shutter=ShutterType.GLOBAL, sh_degree=3,
    tile_culling=True,
):
    """Projection + binning + particle packing (no slot gather).

    Returns (proj, binning, packed [N, 16], tile_grid)."""
    wp, hp = pad_to_tiles(resolution)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)

    proj = proj_ops.project(positions, quats, scales, opacities, cam, pose,
                            shutter, resolution)
    binning = tile_ops.bin_particles(proj, tile_grid, isect_capacity,
                                     tile_culling=tile_culling)

    cam_center = camera_center_world(pose)
    colors = precomputed_features(positions, features, cam_center, sh_degree)
    packed = pack_particles(positions, quats, scales, opacities, colors)

    assert isect_capacity % tile_raster.CHUNK == 0, (
        f"isect_capacity must be a multiple of {tile_raster.CHUNK}")
    return proj, binning, packed, tile_grid


def prepare(
    positions, quats, scales, opacities, features, cam, pose,
    resolution, isect_capacity, shutter=ShutterType.GLOBAL, sh_degree=3,
    tile_culling=True, low_precision_grads=False,
):
    """Projection + binning + packing: everything before compositing.

    Returns (proj, binning, data_sorted [cap, 16], tile_grid)."""
    proj, binning, packed, tile_grid = prepare_packed(
        positions, quats, scales, opacities, features, cam, pose, resolution,
        isect_capacity, shutter, sh_degree, tile_culling)
    from threedgrut_tpu.ops.sorted_gather import sorted_gather
    data_sorted = sorted_gather(
        packed, binning.sorted_particle_idx,
        binning.particle_ends, binning.particle_counts,
        "bf16" if low_precision_grads else "f32")              # [cap, 16]
    return proj, binning, data_sorted, tile_grid


def packed_world_rays(cam, pose, tile_grid, T_to_world=None, t_max=None,
                      shutter: ShutterType = ShutterType.GLOBAL,
                      jitter=None):
    """World-space rays on the tile-padded grid, packed [T, 8, 256].

    `t_max` [hp, wp] optionally bounds each ray's integration segment
    (row 6; <= 0 means unbounded) — the hybrid renderer passes mesh hit
    distances here. With a rolling `shutter`, each pixel's ray uses the pose
    slerped to its shutter time (reference rayPayload.cuh ray init +
    sensors.h pose interpolation)."""
    from threedgrut_tpu.cameras import relative_shutter_time
    wp, hp = (tile_grid[0] * C.TILE_X, tile_grid[1] * C.TILE_Y)
    ray_o_c, ray_d_c = camera_space_rays(cam, (wp, hp), jitter=jitter)
    if shutter != ShutterType.GLOBAL:
        # Per-pixel camera->world pose at the pixel's shutter time.
        xs = jnp.arange(wp, dtype=jnp.float32) + 0.5
        ys = jnp.arange(hp, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        alpha = relative_shutter_time(shutter, (wp, hp),
                                      jnp.stack([gx, gy], -1))  # [hp, wp]
        q = quaternion.slerp(pose.q_start, pose.q_end, alpha[..., None])
        t_w2c = (pose.t_start * (1.0 - alpha[..., None])
                 + pose.t_end * alpha[..., None])
        q_inv = jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
        q_inv = quaternion.normalize(q_inv)
        ray_d = quaternion.rotate(q_inv, ray_d_c).reshape(-1, 3)
        ray_o = (-quaternion.rotate(q_inv, t_w2c)).reshape(-1, 3)
    else:
        if T_to_world is None:
            q_inv = quaternion.normalize(jnp.stack(
                [pose.q_start[0], -pose.q_start[1], -pose.q_start[2],
                 -pose.q_start[3]]))
            R = quaternion.to_rotation_matrix(q_inv)
            t = camera_center_world(pose)
        else:
            R = T_to_world[:3, :3]
            t = T_to_world[:3, 3]
        ray_o = ray_o_c.reshape(-1, 3) @ R.T + t
        ray_d = ray_d_c.reshape(-1, 3) @ R.T
    if t_max is None:
        tmax_img = jnp.zeros((hp, wp, 1))
    else:
        tmax_img = jnp.where(jnp.isfinite(t_max), t_max, 0.0)[..., None]
    rays_img = jnp.concatenate([
        ray_o.reshape(hp, wp, 3), ray_d.reshape(hp, wp, 3),
        tmax_img, jnp.zeros((hp, wp, 1))], axis=-1)
    return tile_pack(rays_img, tile_grid)                      # [T, 8, 256]


def render(
    positions: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    features: jnp.ndarray,
    cam: Camera,
    pose: SensorPose,
    resolution: Tuple[int, int],
    isect_capacity: int,
    shutter: ShutterType = ShutterType.GLOBAL,
    sh_degree: int = 3,
    kernel_degree: int = C.KERNEL_DEGREE_3DGUT,
    min_transmittance: float = C.MIN_TRANSMITTANCE_3DGUT,
    tile_culling: bool = True,
    T_to_world: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
    ray_jitter: jnp.ndarray | None = None,
    sorted_passes: int = 0,
    aux_gradients: bool = True,
    aux_outputs: bool = True,
    low_precision_grads: bool = False,
    hit_visibility: bool = False,
    visibility_threshold: float = 0.0,
    row_termination: bool = False,
    walk_capacity: int | None = None,
) -> Tuple[RenderOutputs, jnp.ndarray]:
    """Render one frame. Returns (outputs, overflow_flag).

    `isect_capacity` is a static bound on tile intersections; `overflow`
    reports (as data) whether the true count exceeded it. `t_max` [h, w]
    optionally bounds each ray's integration segment (hybrid rendering).
    `sorted_passes` > 0 enables the per-ray re-sorted ("sorted" k-buffer)
    compositing mode (reference base_sorted.yaml, k_buffer_size=16).
    `aux_gradients=False` drops gradients through the depth / transmittance /
    hit-count outputs in exchange for a faster backward — safe when the loss
    reads only rgb + opacity (the reference training loss).
    `aux_outputs=False` (requires aux_gradients=False) additionally returns
    zeros for depth/hit_count and skips their forward math in the kernel.
    `low_precision_grads=True` rounds the per-slot backward cotangent reorder
    to bf16 (per-particle sums stay f32) — ~2x faster on the dominant unsort
    stage; keep False when exact gradients matter (parity checks).
    `hit_visibility=True` makes `outputs.visibility` HIT-based: the kernel
    emits a per-slot contributed bit (w > 0 at some pixel — reference
    referenceOptix.cu:158-161 / gutProjector.cuh:275) reduced per particle,
    so occluded/culled particles report invisible. EVAL-ONLY: this leg has
    no VJP — differentiating through the outputs raises ValueError at trace
    time (training derives the same bit from nonzero gradients for free,
    trainer.py). Costs one extra per-slot write + a [cap] 2-op sort.
    `visibility_threshold` (hit_visibility only) keeps a particle visible
    only if some slot's max composite weight (alpha * T_before over the
    tile's pixels) exceeds it — 0.0 is the exact contributed bit; the
    temporal-culling inference path (render/infer.py) uses small positive
    values to drop negligible contributors, trading bounded image error.
    `walk_capacity` (multiple of 256, < isect_capacity) enables the fused
    walked-window-compacted backward (ops/fused_raster.py): the dominant
    cotangent unsort runs over this many slots instead of the full capacity
    whenever the kernel's early exit walked no more than that — gradients
    are exact either way (dense fallback above the bound). Forward-only
    callers gain nothing from it.
    """
    w, h = resolution
    use_fused = (walk_capacity is not None
                 and 0 < walk_capacity < isect_capacity
                 and not hit_visibility)
    if use_fused:
        proj, binning, packed, tile_grid = prepare_packed(
            positions, quats, scales, opacities, features, cam, pose,
            resolution, isect_capacity, shutter, sh_degree, tile_culling)
        data_sorted = None
    else:
        proj, binning, data_sorted, tile_grid = prepare(
            positions, quats, scales, opacities, features, cam, pose,
            resolution, isect_capacity, shutter, sh_degree, tile_culling,
            low_precision_grads)
    if t_max is not None and t_max.shape != (tile_grid[1] * 16,
                                             tile_grid[0] * 16):
        pad_h = tile_grid[1] * 16 - t_max.shape[0]
        pad_w = tile_grid[0] * 16 - t_max.shape[1]
        t_max = jnp.pad(t_max, ((0, pad_h), (0, pad_w)))
    if ray_jitter is not None and ray_jitter.shape[:2] != (
            tile_grid[1] * 16, tile_grid[0] * 16):
        ph = tile_grid[1] * 16 - ray_jitter.shape[0]
        pw = tile_grid[0] * 16 - ray_jitter.shape[1]
        ray_jitter = jnp.pad(ray_jitter, ((0, ph), (0, pw), (0, 0)),
                             constant_values=0.5)
    rays = packed_world_rays(cam, pose, tile_grid, T_to_world, t_max,
                             shutter=shutter, jitter=ray_jitter)

    if row_termination:
        # Per-pixel last-touch bound in rays row 7: pixels composite only
        # slots whose projected footprint reaches their tile row and the
        # window walk stops once every pixel is saturated or past its
        # bound (ops/tiles.row_last_touch, tile_raster row_termination).
        from threedgrut_tpu.ops import tiles as tile_ops
        lt = tile_ops.row_last_touch(binning, proj, tile_grid)
        rays = rays.at[:, 7, :].set(jax.lax.stop_gradient(lt))

    if hit_visibility:
        out, flags_slot = tile_raster._forward(
            jax.lax.stop_gradient(data_sorted), binning.tile_starts,
            binning.tile_ends, rays, kernel_degree, min_transmittance,
            C.MIN_KERNEL_RESPONSE, C.MIN_ALPHA, C.MAX_ALPHA,
            sorted_passes=sorted_passes, has_t_max=t_max is not None,
            aux_outputs=aux_outputs, emit_flags=True,
            row_termination=row_termination)
    elif use_fused:
        from threedgrut_tpu.ops import fused_raster
        out = fused_raster.composite_particles(
            packed, binning.sorted_particle_idx, binning.particle_ends,
            binning.tile_starts, binning.tile_ends, rays, kernel_degree,
            min_transmittance, C.MIN_KERNEL_RESPONSE, C.MIN_ALPHA,
            C.MAX_ALPHA, sorted_passes, t_max is not None, aux_gradients,
            aux_outputs, low_precision_grads, row_termination, walk_capacity)
    else:
        out = tile_raster.tile_composite(
            data_sorted, binning.tile_starts, binning.tile_ends, rays,
            kernel_degree, min_transmittance, sorted_passes=sorted_passes,
            has_t_max=t_max is not None, aux_grads=aux_gradients,
            aux_outputs=aux_outputs, lowprec_grads=low_precision_grads,
            row_termination=row_termination)

    img = tile_unpack(out, tile_grid)                          # [hp, wp, 8]
    img = img[:h, :w]
    if hit_visibility:
        # Loud error instead of silent zero grads; anchored on the packed
        # slot data so any differentiable input reaches the guard.
        img = _eval_only_guard(img, data_sorted)
    rgb = img[..., 0:3]
    opacity = img[..., 3]
    depth = img[..., 4]
    transmittance = img[..., 5]
    hit_count = img[..., 6]

    # Visibility (for SelectiveAdam / densification): particle projected to a
    # renderable splat this frame (reference sets it in the projector,
    # gutProjector.cuh:275). With hit_visibility, refined by the kernel's
    # contributed bit: per-slot flags grouped by particle id (stable sort,
    # contiguous [ends[p-1], ends[p]) segments — sorted_gather.py layout)
    # and any-reduced.
    visibility = proj.valid & (proj.n_tiles > 0)
    if hit_visibility:
        cap = binning.sorted_particle_idx.shape[0]
        # Binarize BEFORE the cumsum: integer-valued f32 sums stay exact
        # (raw weight values would cancel at the running total's epsilon).
        flags_slot = (flags_slot
                      > jnp.float32(visibility_threshold)).astype(
                          jnp.float32)
        _, flg = jax.lax.sort(
            (binning.sorted_particle_idx, flags_slot), num_keys=1)
        cum = jnp.cumsum(flg)
        e = jnp.minimum(binning.particle_ends, cap)
        top = jnp.where(e > 0, cum[jnp.clip(e - 1, 0, cap - 1)], 0.0)
        prev = jnp.concatenate([jnp.zeros((1,), cum.dtype), top[:-1]])
        visibility = visibility & ((top - prev) > 0.0)

    outputs = RenderOutputs(
        rgb=rgb, opacity=opacity, depth=depth,
        transmittance=transmittance, hit_count=hit_count,
        visibility=visibility)
    return outputs, binning.overflow
