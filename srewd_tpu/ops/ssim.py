"""SSIM with scikit-image `structural_similarity` default semantics.

The reference computes SSIM per validation image with skimage defaults and a
per-image data_range of `pred.max() - pred.min()` (reference:
training/metrics.py:240-304). skimage defaults: uniform 7x7 window, K1=0.01,
K2=0.03, sample covariance (N/(N-1)), and the final mean taken over the
image cropped by (win_size-1)//2 on each side.

TPU-first design: the 7x7 uniform window means are computed with VALID
windowed reductions (reduce_window), which both matches skimage's
crop-then-mean exactly (every window is fully in-bounds) and avoids any
boundary handling. Runs batched over NHWC inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_WIN = 7
_K1 = 0.01
_K2 = 0.03


def _window_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all VALID 7x7 windows of NHWC input -> [B, H-6, W-6, C]."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, _WIN, _WIN, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / float(_WIN * _WIN)


def ssim_map(pred: jnp.ndarray, target: jnp.ndarray, data_range: jnp.ndarray) -> jnp.ndarray:
    """SSIM map over valid windows. pred/target NHWC, data_range [B] or scalar."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    ux = _window_mean(pred)
    uy = _window_mean(target)
    uxx = _window_mean(pred * pred)
    uyy = _window_mean(target * target)
    uxy = _window_mean(pred * target)
    np_ = _WIN * _WIN
    cov_norm = np_ / (np_ - 1.0)  # sample covariance, skimage default
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    dr = jnp.asarray(data_range, jnp.float32)
    if dr.ndim == 1:
        dr = dr[:, None, None, None]
    c1 = (_K1 * dr) ** 2
    c2 = (_K2 * dr) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return (a1 * a2) / (b1 * b2)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range=None) -> jnp.ndarray:
    """Mean SSIM per image: NHWC inputs -> [B] (mean over H, W, C of the map).

    data_range=None reproduces the reference's per-image
    `pred.max() - pred.min()` (training/metrics.py:271).
    """
    if data_range is None:
        data_range = jnp.max(pred, axis=(1, 2, 3)) - jnp.min(pred, axis=(1, 2, 3))
    return jnp.mean(ssim_map(pred, target, data_range), axis=(1, 2, 3))
