"""Denoiser for the playground's stochastic renders (SPP/DoF sampling).

Reference role: the OptiX AI denoiser toggle (hybridTracer.cpp:475-509,
engine.py). TPU-native stand-in: an edge-preserving joint-bilateral filter in
pure jnp — guided by depth so Gaussian-splat edges survive — good enough to
clean low-SPP depth-of-field / path-traced frames; swap in a learned
denoiser later without touching callers.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilateral_denoise(rgb: jnp.ndarray, depth: jnp.ndarray | None = None,
                      radius: int = 2, sigma_space: float = 1.5,
                      sigma_color: float = 0.1,
                      sigma_depth: float = 0.5) -> jnp.ndarray:
    """Edge-preserving denoise of [H, W, 3] (optionally depth-guided)."""
    h, w, _ = rgb.shape
    pad = radius
    rp = jnp.pad(rgb, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    dp = None
    if depth is not None:
        finite = jnp.isfinite(depth)
        d = jnp.where(finite, depth, 0.0)
        dp = jnp.pad(d, ((pad, pad), (pad, pad)), mode="edge")

    acc = jnp.zeros_like(rgb)
    wacc = jnp.zeros((h, w, 1))
    inv2ss = 1.0 / (2.0 * sigma_space ** 2)
    inv2sc = 1.0 / (2.0 * sigma_color ** 2)
    inv2sd = 1.0 / (2.0 * sigma_depth ** 2)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = rp[pad + dy:pad + dy + h, pad + dx:pad + dx + w]
            wgt = jnp.exp(-(dx * dx + dy * dy) * inv2ss)
            cd = jnp.sum((shifted - rgb) ** 2, axis=-1, keepdims=True)
            wgt = wgt * jnp.exp(-cd * inv2sc)
            if dp is not None:
                ds = dp[pad + dy:pad + dy + h, pad + dx:pad + dx + w]
                dd = (ds - dp[pad:pad + h, pad:pad + w]) ** 2
                wgt = wgt * jnp.exp(-dd[..., None] * inv2sd)
            acc = acc + shifted * wgt
            wacc = wacc + wgt
    return acc / jnp.maximum(wacc, 1e-8)
