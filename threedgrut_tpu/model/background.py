"""Background compositing after rendering.

Reference semantics: threedgrut/model/background.py:62-102 — black is a no-op,
white blends a constant, and during training an optional random per-pixel
background regularizes opacity. Composed as rgb + (1 - opacity) * bg.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compose(rgb: jnp.ndarray, opacity: jnp.ndarray, color: str,
            train: bool, key: jax.Array | None = None) -> jnp.ndarray:
    """rgb: [..., 3] pre-background radiance; opacity: [...] accumulated alpha."""
    if color == "black":
        return rgb
    t = (1.0 - opacity)[..., None]
    if color == "white":
        return rgb + t
    if color == "random":
        if train:
            if key is None:
                raise ValueError("random background needs a PRNG key in training")
            bg = jax.random.uniform(key, rgb.shape, rgb.dtype)
            return rgb + t * bg
        return rgb  # eval: black, matching the reference
    raise ValueError(f"unknown background color {color!r}")
