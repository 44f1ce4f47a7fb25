"""Image losses: L1 / L2 and SSIM with an 11x11 Gaussian window.

Reference semantics: threedgrut/model/losses.py:21-33 (wraps the fused-ssim
package — standard SSIM, 11x11 Gaussian window sigma 1.5, same padding) and
trainer.get_losses (threedgrut/trainer.py:386-450): total loss is
  lambda_l1 * L1 + lambda_l2 * L2 + lambda_ssim * (1 - SSIM)
with optional per-pixel mask. On TPU the separable Gaussian window becomes two
depthwise convolutions; everything is fused by XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SSIM_C1 = 0.01 ** 2
_SSIM_C2 = 0.03 ** 2


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    import numpy as np
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return np.asarray(g / np.sum(g), np.float32)


def _blur_axis(img: jnp.ndarray, axis: int, w) -> jnp.ndarray:
    """1-D 'same'-zero-padded correlation along `axis` as shift-multiply-
    accumulate. XLA fuses the tap slices into one elementwise pass; the
    conv_general_dilated formulation this replaces lowered 1-feature convs
    off the MXU at ~1.7 ms per tap direction (21 ms total for SSIM fwd+bwd
    at 800x800 on v5e; this form measures ~3 ms)."""
    size = len(w)
    half = size // 2
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(img, pad)
    acc = None
    for k in range(size):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(k, k + n)
        term = float(w[k]) * xp[tuple(sl)]
        acc = term if acc is None else acc + term
    return acc


def _blur(img: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W, C] with 'same' zero padding."""
    w = _gaussian_window(size, sigma)
    return _blur_axis(_blur_axis(img, 0, w), 1, w)


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair in [0, 1]."""
    mu_p = _blur(pred, window_size, sigma)
    mu_g = _blur(gt, window_size, sigma)
    mu_p2, mu_g2, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    sigma_p = _blur(pred * pred, window_size, sigma) - mu_p2
    sigma_g = _blur(gt * gt, window_size, sigma) - mu_g2
    sigma_pg = _blur(pred * gt, window_size, sigma) - mu_pg
    num = (2.0 * mu_pg + _SSIM_C1) * (2.0 * sigma_pg + _SSIM_C2)
    den = (mu_p2 + mu_g2 + _SSIM_C1) * (sigma_p + sigma_g + _SSIM_C2)
    return jnp.mean(num / den)


def l1(pred, gt, mask=None):
    d = jnp.abs(pred - gt)
    if mask is not None:
        return jnp.sum(d * mask) / (jnp.sum(mask) * pred.shape[-1] + 1e-12)
    return jnp.mean(d)


def l2(pred, gt, mask=None):
    d = (pred - gt) ** 2
    if mask is not None:
        return jnp.sum(d * mask) / (jnp.sum(mask) * pred.shape[-1] + 1e-12)
    return jnp.mean(d)


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def total_loss(pred, gt, lambda_l1: float = 0.8, lambda_l2: float = 0.0,
               lambda_ssim: float = 0.2, mask=None):
    """The reference training objective (configs/base_gs.yaml:111-119).

    Returns (loss, dict of terms)."""
    terms = {}
    loss = 0.0
    if lambda_l1:
        terms["l1"] = l1(pred, gt, mask)
        loss += lambda_l1 * terms["l1"]
    if lambda_l2:
        terms["l2"] = l2(pred, gt, mask)
        loss += lambda_l2 * terms["l2"]
    if lambda_ssim:
        if mask is not None:
            pred = pred * mask
            gt = gt * mask
        terms["ssim"] = ssim(pred, gt)
        loss += lambda_ssim * (1.0 - terms["ssim"])
    terms["total"] = loss
    return loss, terms
