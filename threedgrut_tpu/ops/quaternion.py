"""Quaternion utilities (wxyz convention, matching the reference model layout).

Reference semantics: threedgrut/utils/misc.py:69-91 (quaternion_to_so3) and
threedgrt_tracer/include/3dgrt/kernels/cuda/gaussianParticles.cuh (fetchParticleDensity).
All functions are pure jnp, unbatched on the trailing axes, and vmap/jit friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) [..., 4] to unit norm."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion(s) [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    The matrix maps canonical (particle-local) coordinates to world coordinates;
    world->canonical is therefore R^T.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack(
        [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)], axis=-1)
    r1 = jnp.stack(
        [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)], axis=-1)
    r2 = jnp.stack(
        [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation between unit quaternions.

    Used by the rolling-shutter pose interpolation
    (reference: threedgut_tracer/include/3dgut/utils/sensors.h:44-73).
    Falls back to lerp for nearly-parallel quaternions.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    # Take the short path.
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4] (canonical->world)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))
