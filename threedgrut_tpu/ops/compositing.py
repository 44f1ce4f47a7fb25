"""Front-to-back alpha compositing along a sorted hit axis.

TPU-idiomatic formulation: the sequential transmittance recurrence
T_{k+1} = T_k * (1 - alpha_k) is computed as an *exclusive prefix sum of
log(1 - alpha)* — a cumulative sum XLA maps to efficient parallel scans (and
which the Pallas fast path expresses as a triangular matmul on the MXU).
This replaces the reference's per-hit sequential loop
(threedgrt_tracer/src/kernels/cuda/referenceOptix.cu:128-170,
threedgut_tracer/.../gutKBufferRenderer.cuh:109-170) with mathematically
identical results, and is fully differentiable by JAX autodiff.

Early-termination semantics match the reference: a hit is processed iff the
transmittance *before* it is > min_transmittance (the reference kills the ray
once T drops below the threshold).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeResult(NamedTuple):
    rgb: jnp.ndarray            # [..., 3]
    opacity: jnp.ndarray        # [...]  (sum of weights = 1 - T_final)
    depth: jnp.ndarray          # [...]  (alpha-weighted hit distance)
    transmittance: jnp.ndarray  # [...]  final transmittance of processed hits
    hit_count: jnp.ndarray      # [...]  number of contributing hits (weight > 0)
    weights: jnp.ndarray        # [..., K] per-hit compositing weights


def composite(
    alphas: jnp.ndarray,
    colors: jnp.ndarray,
    depths: jnp.ndarray,
    min_transmittance: float,
    initial_transmittance: jnp.ndarray | float = 1.0,
) -> CompositeResult:
    """Composite K depth-sorted hits per ray.

    alphas: [..., K] in [0, 0.99]; rejected hits must carry alpha == 0.
    colors: [..., K, 3]; depths: [..., K].
    """
    log1m = jnp.log1p(-alphas)
    # Exclusive prefix: transmittance before each hit.
    csum = jnp.cumsum(log1m, axis=-1)
    excl = csum - log1m
    t0 = jnp.asarray(initial_transmittance, alphas.dtype)
    t0b = t0[..., None] if t0.ndim else t0
    t_before = t0b * jnp.exp(excl)
    live = t_before > min_transmittance
    weights = jnp.where(live, alphas * t_before, 0.0)
    rgb = jnp.einsum("...k,...kc->...c", weights, colors)
    depth = jnp.sum(weights * depths, axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    # Final transmittance over processed hits only.
    processed_log1m = jnp.where(live, log1m, 0.0)
    t_final = t0 * jnp.exp(jnp.sum(processed_log1m, axis=-1))
    hit_count = jnp.sum((weights > 0.0).astype(jnp.int32), axis=-1)
    return CompositeResult(
        rgb=rgb,
        opacity=opacity,
        depth=depth,
        transmittance=t_final,
        hit_count=hit_count,
        weights=weights,
    )
