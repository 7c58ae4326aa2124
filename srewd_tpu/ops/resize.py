"""Image resampling with exact PyTorch `F.interpolate` parity, as matmuls.

The reference pipeline feeds bicubic x4-upsampled LR fields into every
residual diffusion architecture (reference: data/dataset_builder.py:377,
models/simple_cnn/Simple_CNN.py:25), so the numerics of the interpolation
directly shift the diffusion target x0 = HR - bicubic(LR). PyTorch's bicubic
uses the Keys cubic-convolution kernel with A = -0.75 and half-pixel centers
(align_corners=False) with edge-clamped taps.

TPU-first design: instead of gathers, a 1-D resize from n_in to n_out is a
dense [n_out, n_in] matrix; a 2-D resize is two small matmuls
(out = W_h @ img @ W_w^T), which XLA maps straight onto the MXU and fuses
with neighbouring elementwise work. For the WeatherBench problem size
(32x64 -> 128x256) the matrices are 128x32 and 256x64 — negligible memory,
exact to float rounding.

Supported modes mirror every `F.interpolate` call in the reference:
  - "bicubic"  (align_corners=False, A=-0.75)  — dataset_builder.py:377
  - "bilinear" (align_corners=False)           — phydiff/unet.py: PhyConv 0.5x
  - "nearest"                                  — RRDBNet.py:49-50, Upsample
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch's UpSampleCubic, A=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(n_in: int, n_out: int, method: str = "bicubic") -> np.ndarray:
    """Dense 1-D resampling matrix W with out = W @ in.

    Matches torch.nn.functional.interpolate semantics:
      * half-pixel source coords: s = (o + 0.5) * n_in / n_out - 0.5
        (bicubic / bilinear, align_corners=False)
      * nearest: src = floor(o * n_in / n_out)
      * taps clamped to [0, n_in - 1] (edge replication).
    Computed in float64, returned float32.
    """
    scale = n_in / n_out
    w = np.zeros((n_out, n_in), dtype=np.float64)
    if method == "nearest":
        for o in range(n_out):
            w[o, min(int(np.floor(o * scale)), n_in - 1)] = 1.0
        return w.astype(np.float32)

    for o in range(n_out):
        s = (o + 0.5) * scale - 0.5
        i = int(np.floor(s))
        frac = s - i
        if method == "bicubic":
            taps = range(i - 1, i + 3)
            weights = _cubic_kernel(np.array([frac + 1.0, frac, frac - 1.0, frac - 2.0]))
        elif method == "bilinear":
            taps = (i, i + 1)
            weights = np.array([1.0 - frac, frac])
        else:
            raise ValueError(f"unknown resize method: {method}")
        for tap, weight in zip(taps, weights):
            w[o, int(np.clip(tap, 0, n_in - 1))] += weight
    return w.astype(np.float32)


def resize2d(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic") -> jnp.ndarray:
    """Resize NHWC images to (H_out, W_out) with torch-`interpolate` parity.

    Two small dense matmuls (separable kernel); runs on the MXU. Computation
    is done in the input dtype upcast to float32 for accumulation.
    """
    _, h_in, w_in, _ = x.shape
    h_out, w_out = out_hw
    dtype = x.dtype
    out = x
    # HIGHEST precision: these matmuls define the diffusion target
    # x0 = HR - bicubic(LR); bf16-mantissa MXU passes would shift it.
    if h_out != h_in:
        wh = jnp.asarray(resize_matrix(h_in, h_out, method))
        out = jnp.einsum(
            "oh,bhwc->bowc", wh, out,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
    if w_out != w_in:
        ww = jnp.asarray(resize_matrix(w_in, w_out, method))
        out = jnp.einsum(
            "ow,bhwc->bhoc", ww, out,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
    return out.astype(dtype)


def bicubic_up4(x: jnp.ndarray) -> jnp.ndarray:
    """The hot path: x4 bicubic upsample of NHWC LR fields.

    Reference equivalent: `interpolate(lr, scale_factor=4, mode="bicubic")`
    (data/dataset_builder.py:377) executed per batch on the host CPU; here it
    is a fused on-device matmul pair inside the jitted step.
    """
    _, h, w, _ = x.shape
    return resize2d(x, (4 * h, 4 * w), "bicubic")


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsample of NHWC via broadcast-reshape (no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
