"""Frequency/wavelet-domain pretraining losses for the SimpleCNN encoder.

Reference: models/simple_cnn/loss.py — alpha * FFT-MSE (ortho-normalized,
real+imag parts) + beta * 4-level Haar DWT per-subband MSE; used as the
SimpleCNN pretraining criterion (pretrain.py:141-164). NHWC jnp throughout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .wavelets import haar_dwt_pyramid


def fft_mse_loss(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """MSE between real and imaginary parts of ortho-normed spatial FFTs."""
    f1 = jnp.fft.fftn(img1.astype(jnp.complex64), axes=(1, 2), norm="ortho")
    f2 = jnp.fft.fftn(img2.astype(jnp.complex64), axes=(1, 2), norm="ortho")
    mse_real = jnp.mean(jnp.square(jnp.real(f1) - jnp.real(f2)))
    mse_imag = jnp.mean(jnp.square(jnp.imag(f1) - jnp.imag(f2)))
    return mse_real + mse_imag


def dwt_mse_loss(x: jnp.ndarray, y: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Sum over levels/subbands of MSE between Haar detail coefficients."""
    px = haar_dwt_pyramid(x, levels=levels, combine="none")
    py = haar_dwt_pyramid(y, levels=levels, combine="none")
    total = 0.0
    for (xh, xv, xd), (yh, yv, yd) in zip(px, py):
        total = total + jnp.mean(jnp.square(xh - yh))
        total = total + jnp.mean(jnp.square(xv - yv))
        total = total + jnp.mean(jnp.square(xd - yd))
    return total


def image_compare_loss(
    x: jnp.ndarray, y: jnp.ndarray, alpha: float = 0.2, beta: float = 0.1
) -> jnp.ndarray:
    return alpha * fft_mse_loss(x, y) + beta * dwt_mse_loss(x, y)
