"""Gaussian-particle response math: the shared per-ray/per-particle kernel.

This is the single most load-bearing math in the framework: BOTH renderers
(3DGRT volumetric tracing and 3DGUT rasterization) evaluate per-ray particle
alpha with exactly this function, which is what makes them consistent and
hybridizable (reference: threedgrt_tracer/.../gaussianParticles.cuh:326-394 and
threedgut_tracer/.../gaussianParticles.slang:119-222 — identical math).

Everything here is pure jnp, differentiable, float32, and written unbatched
(vmap for batching). The canonical-space formulation:

    gro = (1/s) * R^T (o - mu)          # ray origin, canonical space
    grd = normalize((1/s) * R^T d)      # ray direction, canonical space
    grayDist = || grd x gro ||^2        # squared min distance to origin
    response = exp(s_n * grayDist^(n/2))
    alpha = min(max_alpha, response * density)
    accept = response > min_response AND alpha > min_alpha
    hitT = || s * grd * <grd, -gro> ||  # scaled projection distance (NOT euclidean t)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from threedgrut_tpu.constants import (
    GG_SCALE,
    MAX_ALPHA,
    MIN_ALPHA,
    MIN_KERNEL_RESPONSE,
)
from threedgrut_tpu.ops import quaternion


def kernel_response(gray_dist: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Generalized-Gaussian response exp(s_n * d^(n/2)) for static degree n.

    Degree 0 is the linear kernel max(1 + s*sqrt(d), 0).
    gray_dist is the squared canonical min distance (>= 0).
    """
    if degree not in GG_SCALE:
        raise ValueError(f"unsupported kernel degree {degree}")
    s = GG_SCALE[degree]
    if degree == 0:
        return jnp.maximum(1.0 + s * jnp.sqrt(gray_dist), 0.0)
    if degree == 1:
        return jnp.exp(s * jnp.sqrt(gray_dist))
    if degree == 2:
        return jnp.exp(s * gray_dist)
    if degree == 3:
        return jnp.exp(s * gray_dist * jnp.sqrt(gray_dist))
    if degree == 4:
        return jnp.exp(s * gray_dist * gray_dist)
    if degree == 5:
        return jnp.exp(s * gray_dist * gray_dist * jnp.sqrt(gray_dist))
    # degree == 8
    d2 = gray_dist * gray_dist
    return jnp.exp(s * d2 * d2)


def canonical_ray(
    position: jnp.ndarray,
    quat: jnp.ndarray,
    scale: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    eps: float = 1e-12,
):
    """Transform a world ray into the particle's canonical (unit-sphere) frame.

    Returns (gro, grd) with grd normalized.
    """
    R = quaternion.to_rotation_matrix(quat)  # canonical->world
    inv_s = 1.0 / scale
    # R^T v as einsum (matmul batch-dim broadcasting is too strict here).
    gro = inv_s * jnp.einsum("...i,...ij->...j", ray_o - position, R)
    grdu = inv_s * jnp.einsum("...i,...ij->...j", ray_d, R)
    n = jnp.linalg.norm(grdu, axis=-1, keepdims=True)
    grd = grdu / jnp.maximum(n, eps)
    return gro, grd


class HitResult(NamedTuple):
    alpha: jnp.ndarray       # compositing alpha in [0, max_alpha]
    accept: jnp.ndarray      # bool — reference acceptance test
    hit_t: jnp.ndarray       # scaled projection distance (depth contribution)
    response: jnp.ndarray    # raw kernel response
    gray_dist: jnp.ndarray   # canonical squared distance (slab-gate input)
    proj: jnp.ndarray        # canonical hit parameter (front-gate input)


def particle_hit(
    position: jnp.ndarray,
    quat: jnp.ndarray,
    scale: jnp.ndarray,
    density: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    kernel_degree: int,
    min_response: float = MIN_KERNEL_RESPONSE,
    min_alpha: float = MIN_ALPHA,
    max_alpha: float = MAX_ALPHA,
    surfel: bool = False,
) -> HitResult:
    """Evaluate one particle against one ray (vmap for batches).

    `density` is the post-activation (sigmoid) opacity scalar.
    Rejected hits return alpha 0 so compositing can be written maskless.

    `surfel=True` is the 2DGS barycentric-surfel variant (reference
    gaussianParticles.cuh processHit<SurfelPrimitive=true> and
    barycentricSurfelsOptix.cu): the response is evaluated at the ray's
    intersection with the particle's canonical z=0 plane, and the hit
    distance is the scaled plane-intersection distance.
    """
    gro, grd = canonical_ray(position, quat, scale, ray_o, ray_d)
    if surfel:
        # t to the z=0 plane in canonical units; rays parallel to the plane
        # (grd.z ~ 0) never hit.
        gz = grd[..., 2]
        safe_gz = jnp.where(jnp.abs(gz) > 1e-9, gz, 1.0)
        t_pl = -gro[..., 2] / safe_gz
        pt = gro + grd * t_pl[..., None]
        gray_dist = jnp.where(jnp.abs(gz) > 1e-9,
                              jnp.sum(pt * pt, axis=-1), jnp.inf)
        proj = t_pl
    else:
        gcrod = jnp.cross(grd, gro)
        gray_dist = jnp.sum(gcrod * gcrod, axis=-1)
        proj = jnp.sum(grd * (-gro), axis=-1)
    response = kernel_response(jnp.where(jnp.isfinite(gray_dist), gray_dist,
                                         1e6), kernel_degree)
    alpha = jnp.minimum(max_alpha, response * density)
    accept = (response > min_response) & (alpha > min_alpha)
    # Depth: length of (scale * grd * t) — the canonical hit parameter mapped
    # back through the scales (center projection, or plane hit for surfels).
    grds = scale * grd * proj[..., None]
    hit_t = jnp.sqrt(jnp.sum(grds * grds, axis=-1))
    alpha = jnp.where(accept, alpha, 0.0)
    return HitResult(alpha=alpha, accept=accept, hit_t=hit_t,
                     response=response, gray_dist=gray_dist, proj=proj)


def particle_normal(
    position: jnp.ndarray,
    quat: jnp.ndarray,
    scale: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    ellipsoid_sq_radius: float = 9.0,
    eps: float = 1e-12,
    surfel: bool = False,
) -> jnp.ndarray:
    """Surface normal at the iso-response ellipsoid hit point
    (reference: gaussianParticles.cuh processHit normal branch). Surfels use
    the reference's (0, 0, sign(grd.z) * (R scale).z) accumulation."""
    R = quaternion.to_rotation_matrix(quat)
    if surfel:
        gro, grd = canonical_ray(position, quat, scale, ray_o, ray_d)
        srot_z = jnp.einsum("...ij,...j->...i", R, scale)[..., 2]
        sign = jnp.where(grd[..., 2] > 0, 1.0, -1.0)
        z = sign * srot_z
        out = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
        norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(norm, eps)
    gro, grd = canonical_ray(position, quat, scale, ray_o, ray_d)
    gcrod = jnp.cross(grd, gro)
    gray_dist = jnp.sum(gcrod * gcrod, axis=-1)
    proj = jnp.sum(grd * (-gro), axis=-1)
    t_surf = proj - jnp.sqrt(jnp.maximum(ellipsoid_sq_radius - gray_dist, 0.0))
    p = gro + grd * t_surf[..., None]
    # (R * scale) applied: world-space gradient direction of the ellipsoid.
    n_world = jnp.einsum("...ij,...j->...i", R, p * scale)
    norm = jnp.linalg.norm(n_world, axis=-1, keepdims=True)
    return n_world / jnp.maximum(norm, eps)
