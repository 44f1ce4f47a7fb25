"""3DGUT unscented-transform particle projection (pure jnp, batched over N).

Projects every particle through the (possibly nonlinear, possibly rolling-
shutter) camera via 7 sigma points, estimates the 2D mean/covariance, builds
the conic/extent used ONLY for tile binning and sort order (the per-ray alpha
is re-evaluated in 3D ray space by ops.particles), and computes the tile-space
bounding box and culling quantities.

Reference: threedgut_tracer/include/3dgut/kernels/cuda/renderers/gutProjector.cuh
(unscentedParticleProjection:118-215, computeProjectedExtentConicOpacity:81-116,
tileMinParticlePowerResponse:49-78, eval:217-322).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import (
    Camera,
    SensorPose,
    ShutterType,
    project_point_with_shutter,
    transform_to_camera,
)
from threedgrut_tpu.ops import quaternion


class Projection(NamedTuple):
    center: jnp.ndarray        # [N, 2] projected 2D mean (pixels)
    conic: jnp.ndarray         # [N, 3] inverse dilated covariance (a, b, c)
    comp_opacity: jnp.ndarray  # [N] mip-splatting-compensated opacity
    extent: jnp.ndarray        # [N, 2] pixel-space half-extent (rect bounding)
    depth: jnp.ndarray         # [N] sort key (sensor z or distance)
    max_power: jnp.ndarray     # [N] log(comp_opacity / alpha_threshold)
    valid: jnp.ndarray         # [N] bool — projects to a renderable splat
    tile_min: jnp.ndarray      # [N, 2] int32 inclusive tile bbox min
    tile_max: jnp.ndarray      # [N, 2] int32 exclusive tile bbox max
    n_tiles: jnp.ndarray       # [N] int32 bbox tile count (pre-culling)


def ut_sigma_projection(
    positions: jnp.ndarray,   # [N, 3] world means
    quats: jnp.ndarray,       # [N, 4] normalized
    scales: jnp.ndarray,      # [N, 3] post-activation
    cam: Camera,
    pose: SensorPose,
    shutter: ShutterType,
    resolution: Tuple[int, int],
    n_rolling_shutter_iterations: int = C.N_ROLLING_SHUTTER_ITERATIONS,
    require_all_sigma_points: bool = C.UT_REQUIRE_ALL_SIGMA_POINTS,
):
    """Returns (center2d [N,2], cov2d [N,3] (xx, xy, yy), valid [N])."""
    D = C.UT_D
    lam = C.UT_ALPHA * C.UT_ALPHA * (D + C.UT_KAPPA) - D
    delta = jnp.sqrt(C.UT_ALPHA * C.UT_ALPHA * (D + C.UT_KAPPA))
    w_mean_0 = lam / (D + lam)
    w_i = 1.0 / (2.0 * (D + lam))
    w_cov_0 = w_mean_0 + (1.0 - C.UT_ALPHA * C.UT_ALPHA + C.UT_BETA)

    R = quaternion.to_rotation_matrix(quats)  # [N, 3, 3] canonical->world
    # Sigma offsets: delta * s_i * (i-th canonical axis in world) = delta * s_i * R[:, i].
    axes = jnp.swapaxes(R, -1, -2)  # [N, 3(axis), 3(world)]
    offsets = delta * scales[..., None] * axes  # [N, 3, 3]

    def proj(pts):
        return project_point_with_shutter(
            cam, pose, shutter, resolution, pts, C.UT_IMAGE_MARGIN,
            n_iterations=n_rolling_shutter_iterations)

    p0, v0 = proj(positions)                       # [N, 2], [N]
    pp, vp = proj(positions[:, None, :] + offsets)  # [N, 3, 2], [N, 3]
    pm, vm = proj(positions[:, None, :] - offsets)

    center = w_mean_0 * p0 + w_i * (jnp.sum(pp, axis=1) + jnp.sum(pm, axis=1))

    d0 = p0 - center
    dp = pp - center[:, None, :]
    dm = pm - center[:, None, :]

    def outer2(d):  # [..., 2] -> (xx, xy, yy)
        return jnp.stack([d[..., 0] * d[..., 0],
                          d[..., 0] * d[..., 1],
                          d[..., 1] * d[..., 1]], axis=-1)

    cov = (w_cov_0 * outer2(d0)
           + w_i * (jnp.sum(outer2(dp), axis=1) + jnp.sum(outer2(dm), axis=1)))

    n_valid = (v0.astype(jnp.int32) + jnp.sum(vp.astype(jnp.int32), axis=1)
               + jnp.sum(vm.astype(jnp.int32), axis=1))
    if require_all_sigma_points:
        valid = n_valid == (2 * D + 1)
    else:
        valid = n_valid > 0
    return center, cov, valid


def conic_extent_opacity(cov: jnp.ndarray, opacity: jnp.ndarray,
                         alpha_threshold: float = C.MIN_ALPHA):
    """2D covariance (xx, xy, yy) -> conic, compensated opacity, extent, validity.

    Implements the dilation (+0.3 px), Mip-Splatting opacity compensation,
    tight opacity bounding and rect bounding of the reference.
    """
    dil = jnp.stack([cov[..., 0] + C.COVARIANCE_DILATION, cov[..., 1],
                     cov[..., 2] + C.COVARIANCE_DILATION], axis=-1)
    det_dil = dil[..., 0] * dil[..., 2] - dil[..., 1] * dil[..., 1]
    det_ok = det_dil != 0.0
    safe_det = jnp.where(det_ok, det_dil, 1.0)
    conic = jnp.stack([dil[..., 2], -dil[..., 1], dil[..., 0]],
                      axis=-1) / safe_det[..., None]
    if C.MIP_SPLATTING_SCALING:
        det = cov[..., 0] * cov[..., 2] - cov[..., 1] * cov[..., 1]
        comp = jnp.sqrt(jnp.maximum(0.000025, det / safe_det))
        comp_opacity = opacity * comp
    else:
        comp_opacity = opacity
    opa_ok = comp_opacity >= alpha_threshold
    safe_opa = jnp.maximum(comp_opacity, alpha_threshold)
    max_power = jnp.log(safe_opa / alpha_threshold)
    if C.TIGHT_OPACITY_BOUNDING:
        extent_factor = jnp.minimum(C.MAX_EXTENT_SIGMA,
                                    jnp.sqrt(2.0 * max_power))
    else:
        extent_factor = jnp.full_like(max_power, C.MAX_EXTENT_SIGMA)
    mid = 0.5 * (dil[..., 0] + dil[..., 2])
    lam_max = mid + jnp.sqrt(jnp.maximum(C.MIN_PROJ_LAMBDA,
                                         mid * mid - det_dil))
    radius = extent_factor * jnp.sqrt(lam_max)
    if C.RECT_BOUNDING:
        diag = jnp.sqrt(jnp.maximum(
            jnp.stack([dil[..., 0], dil[..., 2]], axis=-1), 0.0))
        extent = jnp.minimum(extent_factor[..., None] * diag,
                             radius[..., None])
    else:
        extent = jnp.broadcast_to(radius[..., None], radius.shape + (2,))
    valid = det_ok & opa_ok & (radius > 0.0)
    return conic, comp_opacity, extent, max_power, valid


def tile_bbox(center: jnp.ndarray, extent: jnp.ndarray,
              tile_grid: Tuple[int, int]):
    """Pixel-space splat -> inclusive-min/exclusive-max tile bbox (clamped)."""
    gx, gy = tile_grid
    tmin_x = jnp.clip(jnp.floor(
        (center[..., 0] - 0.5 - extent[..., 0]) / C.TILE_X).astype(jnp.int32), 0, gx)
    tmin_y = jnp.clip(jnp.floor(
        (center[..., 1] - 0.5 - extent[..., 1]) / C.TILE_Y).astype(jnp.int32), 0, gy)
    tmax_x = jnp.clip(jnp.ceil(
        (center[..., 0] - 0.5 + extent[..., 0]) / C.TILE_X).astype(jnp.int32), 0, gx)
    tmax_y = jnp.clip(jnp.ceil(
        (center[..., 1] - 0.5 + extent[..., 1]) / C.TILE_Y).astype(jnp.int32), 0, gy)
    tile_min = jnp.stack([tmin_x, tmin_y], axis=-1)
    tile_max = jnp.stack([tmax_x, tmax_y], axis=-1)
    n = jnp.maximum(tmax_x - tmin_x, 0) * jnp.maximum(tmax_y - tmin_y, 0)
    return tile_min, tile_max, n


def tile_min_power_response(tile_xy: jnp.ndarray, conic: jnp.ndarray,
                            center: jnp.ndarray) -> jnp.ndarray:
    """Approximate minimum Gaussian power over a 16x16 tile — the per-tile
    culling test (gutProjector.cuh:49-78). tile_xy are integer tile coords
    broadcastable against conic [..., 3] and center [..., 2]."""
    tile_size = jnp.array([C.TILE_X, C.TILE_Y], dtype=jnp.float32)
    tmin = tile_size * tile_xy
    tmax = tmin + tile_size
    min_off = tmin - center
    left_above = (min_off > 0.0).astype(jnp.float32)
    not_in_range = left_above + (center > tmax).astype(jnp.float32)
    outside = (not_in_range[..., 0] + not_in_range[..., 1]) > 0.0
    p = tmax + (tmin - tmax) * left_above
    dxy = jnp.where(min_off >= 0.0, tile_size, -tile_size)
    diff = center - p
    cx, cb, cz = conic[..., 0], conic[..., 1], conic[..., 2]
    rcp_x = 1.0 / (tile_size[0] * tile_size[0] * cx)
    rcp_y = 1.0 / (tile_size[1] * tile_size[1] * cz)
    tx = not_in_range[..., 1] * jnp.clip(
        (dxy[..., 0] * cx * diff[..., 0] + dxy[..., 0] * cb * diff[..., 1])
        * rcp_x, 0.0, 1.0)
    ty = not_in_range[..., 0] * jnp.clip(
        (dxy[..., 1] * cb * diff[..., 0] + dxy[..., 1] * cz * diff[..., 1])
        * rcp_y, 0.0, 1.0)
    dx = center[..., 0] - (p[..., 0] + tx * dxy[..., 0])
    dy = center[..., 1] - (p[..., 1] + ty * dxy[..., 1])
    power = 0.5 * (cx * dx * dx + cz * dy * dy) + cb * dx * dy
    return jnp.where(outside, power, 0.0)


def project(
    positions: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: Camera,
    pose: SensorPose,
    shutter: ShutterType,
    resolution: Tuple[int, int],
    global_z_order: bool = True,
    min_sensor_z: float = C.MIN_SENSOR_Z,
) -> Projection:
    """Full projector eval over all particles. Inputs are post-activation."""
    w, h = resolution
    tile_grid = (-(-w // C.TILE_X), -(-h // C.TILE_Y))

    cam_pos_start = transform_to_camera(pose.q_start, pose.t_start, positions)
    sensor_z = cam_pos_start[..., 2]
    pre_valid = (opacities >= C.MIN_ALPHA) & (sensor_z >= min_sensor_z)

    center, cov, proj_valid = ut_sigma_projection(
        positions, quats, scales, cam, pose, shutter, resolution)
    conic, comp_opacity, extent, max_power, conic_valid = conic_extent_opacity(
        cov, opacities)

    valid = pre_valid & proj_valid & conic_valid
    tile_min, tile_max, n_tiles = tile_bbox(center, extent, tile_grid)
    n_tiles = jnp.where(valid & (extent[..., 0] > 1e-6), n_tiles, 0)

    if global_z_order:
        depth = sensor_z
    else:
        # Distance from the camera center (world space).
        cam_center = -quaternion.rotate(
            quaternion.normalize(jnp.stack([pose.q_start[0], -pose.q_start[1],
                                            -pose.q_start[2], -pose.q_start[3]])),
            pose.t_start)
        depth = jnp.linalg.norm(positions - cam_center, axis=-1)

    return Projection(
        center=center,
        conic=conic,
        comp_opacity=comp_opacity,
        extent=extent,
        depth=depth,
        max_power=max_power,
        valid=valid,
        tile_min=tile_min,
        tile_max=tile_max,
        n_tiles=n_tiles,
    )
