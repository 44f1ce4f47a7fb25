"""Environment maps and tonemapping for the playground.

Reference: threedgrut_playground/utils/environment (equirectangular HDR
sampling, filmic tonemap) — pure jnp port.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sample_envmap(envmap: jnp.ndarray | None, dirs: jnp.ndarray,
                  default_color=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Sample an equirect [H, W, 3] map along unit directions [..., 3]."""
    if envmap is None:
        return jnp.broadcast_to(jnp.asarray(default_color, jnp.float32),
                                dirs.shape[:-1] + (3,))
    h, w = envmap.shape[:2]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-12)
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))       # polar from +z
    phi = jnp.arctan2(d[..., 1], d[..., 0])                  # [-pi, pi]
    u = (phi / (2.0 * np.pi) + 0.5) * (w - 1)
    v = theta / np.pi * (h - 1)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    c = (envmap[v0, u0] * (1 - fu) * (1 - fv)
         + envmap[v0, u1] * fu * (1 - fv)
         + envmap[v1, u0] * (1 - fu) * fv
         + envmap[v1, u1] * fu * fv)
    return c


def filmic_tonemap(x: jnp.ndarray) -> jnp.ndarray:
    """ACES-style filmic curve (the playground's HDR display transform)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)
