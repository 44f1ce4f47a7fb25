"""Camera models: OpenCV pinhole (rational radial + tangential + thin-prism) and
OpenCV fisheye (theta-polynomial), rolling-shutter pose interpolation, and ray
generation (forward projection + Newton-inverted rays).

Reference semantics:
  - projection: threedgut_tracer/include/3dgut/kernels/cuda/sensors/cameraProjections.cuh:30-185
  - parameter structs / shutter enum: threedgrut/datasets/camera_models.py:130-236
  - pinhole ray grid: threedgrut/datasets/utils.py:39-60

Everything is pure jnp; camera parameter containers are pytrees so they can be
closed over or passed through jit. Resolutions are static Python ints.
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops import quaternion


class ShutterType(enum.IntEnum):
    GLOBAL = 0
    ROLLING_TOP_TO_BOTTOM = 1
    ROLLING_LEFT_TO_RIGHT = 2
    ROLLING_BOTTOM_TO_TOP = 3
    ROLLING_RIGHT_TO_LEFT = 4


class PinholeCamera(NamedTuple):
    """OpenCV pinhole camera. All distortion coefficients optional (zeros = ideal)."""
    focal: jnp.ndarray          # [2] fx, fy
    principal: jnp.ndarray      # [2] cx, cy
    radial: jnp.ndarray         # [6] k1..k6 (rational model)
    tangential: jnp.ndarray     # [2] p1, p2
    thin_prism: jnp.ndarray     # [4] s1..s4


class FisheyeCamera(NamedTuple):
    """OpenCV fisheye camera: r(theta) = theta * (1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8)."""
    focal: jnp.ndarray          # [2]
    principal: jnp.ndarray      # [2]
    radial: jnp.ndarray         # [4] k1..k4
    max_angle: jnp.ndarray      # [] scalar, radians


Camera = Union[PinholeCamera, FisheyeCamera]


class SensorPose(NamedTuple):
    """World->camera pose pair for shutter interpolation (reference SensorPose3D).

    For global-shutter / static cameras, start == end.
    Quaternions are wxyz; x_cam = R(q) x_world + t.
    """
    q_start: jnp.ndarray  # [4]
    t_start: jnp.ndarray  # [3]
    q_end: jnp.ndarray    # [4]
    t_end: jnp.ndarray    # [3]


def pose_from_matrix(T_to_world: jnp.ndarray) -> SensorPose:
    """Build a static SensorPose from a camera-to-world 4x4 matrix."""
    R_c2w = T_to_world[:3, :3]
    t_c2w = T_to_world[:3, 3]
    R_w2c = R_c2w.T
    t_w2c = -R_w2c @ t_c2w
    q = matrix_to_quat(R_w2c)
    return SensorPose(q_start=q, t_start=t_w2c, q_end=q, t_end=t_w2c)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> wxyz quaternion (branchless, Shepperd-style)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22])
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    case0 = jnp.stack([qw[0], (m21 - m12) / (4 * qw[0]),
                       (m02 - m20) / (4 * qw[0]), (m10 - m01) / (4 * qw[0])])
    case1 = jnp.stack([(m21 - m12) / (4 * qw[1]), qw[1],
                       (m01 + m10) / (4 * qw[1]), (m02 + m20) / (4 * qw[1])])
    case2 = jnp.stack([(m02 - m20) / (4 * qw[2]), (m01 + m10) / (4 * qw[2]),
                       qw[2], (m12 + m21) / (4 * qw[2])])
    case3 = jnp.stack([(m10 - m01) / (4 * qw[3]), (m02 + m20) / (4 * qw[3]),
                       (m12 + m21) / (4 * qw[3]), qw[3]])
    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22]))
    q = jnp.stack([case0, case1, case2, case3])[idx]
    return quaternion.normalize(q)


# ---------------------------------------------------------------------------
# Forward projection (camera-space position -> pixel)
# ---------------------------------------------------------------------------

def _within_resolution(resolution: Tuple[int, int], tolerance: float,
                       p: jnp.ndarray) -> jnp.ndarray:
    w, h = float(resolution[0]), float(resolution[1])
    mx, my = w * tolerance, h * tolerance
    return ((p[..., 0] > -mx) & (p[..., 1] > -my)
            & (p[..., 0] < w + mx) & (p[..., 1] < h + my))


def project_point_pinhole(cam: PinholeCamera, resolution: Tuple[int, int],
                          position: jnp.ndarray, tolerance: float):
    """Project camera-space points [..., 3] -> (uv [..., 2], valid [...]).

    Matches the reference exactly, including the out-of-limits radial fallback
    (clip to the image-circle radius) and the z<=0 -> (0,0) fallback; invalid
    points still return defined values because the UT mean/covariance uses
    them (gutProjector.cuh unscentedParticleProjection).
    """
    z = position[..., 2]
    safe_z = jnp.where(z > 0.0, z, 1.0)
    uvn = position[..., :2] / safe_z[..., None]
    uvsq = uvn * uvn
    r2 = uvsq[..., 0] + uvsq[..., 1]
    a1 = 2.0 * uvn[..., 0] * uvn[..., 1]
    a2 = r2 + 2.0 * uvsq[..., 0]
    a3 = r2 + 2.0 * uvsq[..., 1]
    k = cam.radial
    icd_num = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    icd_den = 1.0 + r2 * (k[3] + r2 * (k[4] + r2 * k[5]))
    icd = icd_num / icd_den
    p1, p2 = cam.tangential[0], cam.tangential[1]
    s = cam.thin_prism
    delta = jnp.stack([
        p1 * a1 + p2 * a2 + r2 * (s[0] + r2 * s[1]),
        p1 * a3 + p2 * a1 + r2 * (s[2] + r2 * s[3]),
    ], axis=-1)
    uv_nd = icd[..., None] * uvn + delta
    valid_radial = (icd > 0.8) & (icd < 1.2)
    projected_ok = uv_nd * cam.focal + cam.principal
    # Out-of-limits fallback: clip along the undistorted direction.
    roi_radius = float(np.hypot(resolution[0], resolution[1]))
    safe_r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    projected_bad = (roi_radius / safe_r)[..., None] * uvn + cam.principal
    projected = jnp.where(valid_radial[..., None], projected_ok, projected_bad)
    projected = jnp.where((z > 0.0)[..., None], projected, 0.0)
    valid = (z > 0.0) & valid_radial & _within_resolution(resolution, tolerance, projected)
    return projected, valid


def project_point_fisheye(cam: FisheyeCamera, resolution: Tuple[int, int],
                          position: jnp.ndarray, tolerance: float):
    """Project camera-space points through the fisheye theta-polynomial."""
    eps = jnp.finfo(jnp.float32).eps
    rho = jnp.maximum(
        jnp.sqrt(position[..., 0] ** 2 + position[..., 1] ** 2), eps)
    theta_full = jnp.arctan2(rho, position[..., 2])
    theta = jnp.minimum(theta_full, cam.max_angle)
    t2 = theta * theta
    k = cam.radial
    # Horner evaluation of 1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8.
    poly = ((((k[3]) * t2 + k[2]) * t2 + k[1]) * t2 + k[0])
    delta = theta * (poly * t2 + 1.0) / rho
    projected = cam.focal * position[..., :2] * delta[..., None] + cam.principal
    valid = (theta_full < cam.max_angle) & _within_resolution(
        resolution, tolerance, projected)
    return projected, valid


def project_point(cam: Camera, resolution: Tuple[int, int],
                  position: jnp.ndarray, tolerance: float):
    if isinstance(cam, PinholeCamera):
        return project_point_pinhole(cam, resolution, position, tolerance)
    if isinstance(cam, FisheyeCamera):
        return project_point_fisheye(cam, resolution, position, tolerance)
    raise TypeError(f"unknown camera type {type(cam)}")


def relative_shutter_time(shutter: ShutterType, resolution: Tuple[int, int],
                          position: jnp.ndarray) -> jnp.ndarray:
    w, h = float(resolution[0]), float(resolution[1])
    x, y = position[..., 0], position[..., 1]
    if shutter == ShutterType.ROLLING_TOP_TO_BOTTOM:
        return jnp.floor(y) / (h - 1.0)
    if shutter == ShutterType.ROLLING_LEFT_TO_RIGHT:
        return jnp.floor(x) / (w - 1.0)
    if shutter == ShutterType.ROLLING_BOTTOM_TO_TOP:
        return (h - jnp.ceil(y)) / (h - 1.0)
    if shutter == ShutterType.ROLLING_RIGHT_TO_LEFT:
        return (w - jnp.ceil(x)) / (w - 1.0)
    return jnp.full(position.shape[:-1], 0.5, position.dtype)


def transform_to_camera(pose_q: jnp.ndarray, pose_t: jnp.ndarray,
                        position: jnp.ndarray) -> jnp.ndarray:
    return quaternion.rotate(pose_q, position) + pose_t


def project_point_with_shutter(
    cam: Camera,
    pose: SensorPose,
    shutter: ShutterType,
    resolution: Tuple[int, int],
    position: jnp.ndarray,
    tolerance: float,
    n_iterations: int = 5,
):
    """World-space points -> pixels, with rolling-shutter fixed-point iteration.

    Matches cameraProjections.cuh:146-185: project at start pose; for rolling
    shutters, fall back to the end pose if invalid, then iterate pose
    interpolation at the estimated shutter time a static number of times.
    """
    proj, valid = project_point(
        cam, resolution, transform_to_camera(pose.q_start, pose.t_start, position),
        tolerance)
    if shutter == ShutterType.GLOBAL:
        return proj, valid

    proj_end, valid_end = project_point(
        cam, resolution, transform_to_camera(pose.q_end, pose.t_end, position),
        tolerance)
    proj = jnp.where(valid[..., None], proj, proj_end)
    any_valid = valid | valid_end

    def refine(carry, _):
        proj_c, valid_c = carry
        alpha = relative_shutter_time(shutter, resolution, proj_c)
        q = quaternion.slerp(pose.q_start, pose.q_end, alpha[..., None])
        t = pose.t_start * (1.0 - alpha[..., None]) + pose.t_end * alpha[..., None]
        cam_pos = quaternion.rotate(q, position) + t
        proj_n, valid_n = project_point(cam, resolution, cam_pos, tolerance)
        return (proj_n, valid_n), None

    (proj, valid), _ = jax.lax.scan(
        refine, (proj, valid), None, length=n_iterations)
    return proj, valid & any_valid


# ---------------------------------------------------------------------------
# Ray generation (pixel -> camera-space ray)
# ---------------------------------------------------------------------------

def pinhole_camera_rays(cam: PinholeCamera, resolution: Tuple[int, int],
                        jitter: jnp.ndarray | None = None):
    """Per-pixel camera-space rays for an (ideally undistorted) pinhole camera.

    Returns (origins [H, W, 3] zeros, dirs [H, W, 3] normalized). Pixel centers
    at +0.5 like the reference dataset ray grids.
    """
    w, h = resolution
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    u = (gx + jx - cam.principal[0]) / cam.focal[0]
    v = (gy + jy - cam.principal[1]) / cam.focal[1]
    d = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros_like(d)
    return o, d


def fisheye_camera_rays(cam: FisheyeCamera, resolution: Tuple[int, int],
                        newton_iterations: int = 10):
    """Per-pixel rays for the fisheye model via Newton inversion of the
    theta-polynomial (reference: threedgrut/datasets/camera_models.py:130-236)."""
    w, h = resolution
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    mx = (gx - cam.principal[0]) / cam.focal[0]
    my = (gy - cam.principal[1]) / cam.focal[1]
    r_d = jnp.sqrt(mx * mx + my * my)  # distorted radius = theta * poly(theta)
    k = cam.radial

    def f(theta):
        t2 = theta * theta
        return theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))

    def fprime(theta):
        t2 = theta * theta
        return (1.0 + t2 * (3.0 * k[0] + t2 * (5.0 * k[1] + t2 * (7.0 * k[2]
                + t2 * 9.0 * k[3]))))

    theta = r_d  # initial guess

    def newton(theta, _):
        theta = theta - (f(theta) - r_d) / jnp.maximum(fprime(theta), 1e-6)
        return theta, None

    theta, _ = jax.lax.scan(newton, theta, None, length=newton_iterations)
    theta = jnp.clip(theta, 0.0, None)
    safe_r = jnp.maximum(r_d, 1e-9)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    d = jnp.stack([sin_t * mx / safe_r, sin_t * my / safe_r, cos_t], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros_like(d)
    return o, d


def rays_to_world(T_to_world: jnp.ndarray, ray_o: jnp.ndarray,
                  ray_d: jnp.ndarray):
    """Camera-space rays -> world via a camera-to-world 4x4 (or 4x3) matrix."""
    R = T_to_world[:3, :3]
    t = T_to_world[:3, 3]
    o = ray_o @ R.T + t
    d = ray_d @ R.T
    return o, d
