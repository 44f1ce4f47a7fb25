"""Real spherical-harmonics radiance evaluation (degree <= 3).

Same basis and constants as the reference
(threedgrt_tracer/include/3dgrt/kernels/cuda/gaussianParticles.cuh:43-82,
radianceFromSpH): radiance = sum_k basis_k(dir) * coeff_k + 0.5, optionally
clamped at 0. Note the reference's degree-1 sign pattern: -C1*y*f1 + C1*z*f2 - C1*x*f3.
"""
from __future__ import annotations

import jax.numpy as jnp

from threedgrut_tpu.constants import SH_C0, SH_C1, SH_C2, SH_C3


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the SH basis at unit directions [..., 3] -> [..., (deg+1)^2].

    `degree` must be a static Python int in {0, 1, 2, 3}.
    """
    if degree not in (0, 1, 2, 3):
        raise ValueError(f"unsupported SH degree {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def radiance_from_sh(
    degree: int,
    coeffs: jnp.ndarray,
    dirs: jnp.ndarray,
    clamped: bool = True,
) -> jnp.ndarray:
    """Evaluate SH radiance.

    coeffs: [..., K, 3] with K >= (degree+1)^2 (extra coefficients ignored —
    this implements the reference's progressive-SH behaviour where only the
    first (deg+1)^2 coefficients are active).
    dirs: [..., 3] unit view directions (world space, from camera to point).
    Returns [..., 3]; radiance + 0.5 with optional clamp at 0.
    """
    basis = sh_basis(degree, dirs)  # [..., K_active]
    k = basis.shape[-1]
    rad = jnp.einsum("...k,...kc->...c", basis, coeffs[..., :k, :]) + 0.5
    if clamped:
        rad = jnp.maximum(rad, 0.0)
    return rad
