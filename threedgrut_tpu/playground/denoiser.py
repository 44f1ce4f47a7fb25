"""Denoisers for the playground's stochastic renders (SPP/DoF sampling).

Reference role: the OptiX AI denoiser toggle (hybridTracer.cpp:475-509,
engine.py). TPU-native stand-ins, pure jnp:

  * `bilateral_denoise` — single-pass depth-guided joint-bilateral filter.
  * `atrous_denoise` — SVGF-style multi-scale a-trous edge-avoiding wavelet
    filter (Dammertz et al. 2010 / Schied et al. 2017): N dilated 5x5
    passes with luminance-variance-normalized color weights plus depth
    guidance. Reaches a much larger footprint than the bilateral at the
    same cost and adapts smoothing strength to local noise level, which is
    the property that makes the AI denoiser effective on 1-SPP DoF/path
    traces. Swap in a learned denoiser later without touching callers.
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


def _luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def _local_variance(lum, radius: int = 1):
    """Luminance variance over a (2r+1)^2 neighbourhood (SVGF's spatial
    variance estimate for single-frame input)."""
    h, w = lum.shape
    p = jnp.pad(lum, radius, mode="edge")
    s1 = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    n = (2 * radius + 1) ** 2
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            v = p[radius + dy:radius + dy + h, radius + dx:radius + dx + w]
            s1 = s1 + v
            s2 = s2 + v * v
    mean = s1 / n
    return jnp.maximum(s2 / n - mean * mean, 0.0)


# 1D a-trous B3 spline kernel; outer product gives the 5x5 stencil.
_B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def atrous_denoise(rgb: jnp.ndarray, depth: jnp.ndarray | None = None,
                   n_passes: int = 4, sigma_color: float = 4.0,
                   sigma_depth: float = 0.2) -> jnp.ndarray:
    """SVGF-style a-trous wavelet denoise of [H, W, 3].

    Each pass applies a 5x5 B3-spline stencil with dilation 2^i; color
    weights are normalized by the local luminance std-dev (more noise ->
    more smoothing; edges with contrast above the noise floor survive) and
    by depth differences when `depth` is given.
    """
    h, w, _ = rgb.shape
    out = rgb
    dpth = None
    if depth is not None:
        dpth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    for i in range(n_passes):
        step = 1 << i
        pad = 2 * step
        var = _local_variance(_luminance(out))
        sigma_l = sigma_color * jnp.sqrt(var) + 1e-4
        rp = jnp.pad(out, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
        dp = (jnp.pad(dpth, pad, mode="edge")
              if dpth is not None else None)
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((h, w, 1))
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                shifted = rp[pad + dy:pad + dy + h,
                             pad + dx:pad + dx + w]
                wgt = jnp.full((h, w), _B3[ky] * _B3[kx])
                ld = jnp.abs(_luminance(shifted) - _luminance(out))
                wgt = wgt * jnp.exp(-ld / sigma_l)
                if dp is not None:
                    dd = jnp.abs(dp[pad + dy:pad + dy + h,
                                    pad + dx:pad + dx + w] - dpth)
                    wgt = wgt * jnp.exp(-dd / sigma_depth)
                acc = acc + shifted * wgt[..., None]
                wacc = wacc + wgt[..., None]
        out = acc / jnp.maximum(wacc, 1e-8)
    return out
