"""FD_Info_Spliter — ResDiff's frequency-domain conditioning front-end.

Reference: models/diffusion_models/resdiff/fd_info_spliter.py. Splits the
UNet input into (cnn_prediction, noisy) maps and produces a 5C-channel
conditioning stack:
  [noisy, cnn_pred, noise-suppressed noisy, low-freq attention map,
   |IFFT| high-freq map]
using a noise-level-conditioned squeeze-excite gate and a learned Gaussian
high-pass in the FFT domain.

Deviation from the reference (documented): the reference calls
`torch.fft.fftn(tensor_complex)` with no `dim` argument
(fd_info_spliter.py:63), transforming over the *batch* dimension as well,
which couples samples within a batch and breaks under data parallelism. We
transform over the spatial dims only (the evident intent of the ResDiff
paper); the learned SE gates absorb any scale difference.

The unshifted-FFT-with-centered-grid quirk (distance grid u,v centered at
n/2 while the spectrum is NOT fftshifted, fd_info_spliter.py:54-58) is
replicated as-is for behavioural parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResSE, default_kernel_init


class FDInfoSpliter(nn.Module):
    image_channels: int
    out_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_embed: jnp.ndarray) -> jnp.ndarray:
        c = self.image_channels
        cnn_x = x[..., :c]
        xn = x[..., c:]
        b, h, w, _ = x.shape

        # --- noise image suppression (fd_info_spliter.py:43-47) ---
        ne = nn.Dense(w, kernel_init=default_kernel_init, dtype=self.dtype)(noise_embed)
        ne = jnp.broadcast_to(ne[:, None, :, None], (b, h, w, c)).astype(x.dtype)
        noise_atten = ResSE(reduction=1 if c == 1 else 2, dtype=self.dtype)(ne)
        denoise_x = xn * noise_atten

        # --- high/low frequency separation (fd_info_spliter.py:49-96) ---
        fft = jnp.fft.fftn(cnn_x.astype(jnp.complex64), axes=(1, 2))
        x_fd = jnp.concatenate([jnp.real(fft), jnp.imag(fft)], axis=-1).astype(x.dtype)

        side = float(min(h, w))
        se = ResSE(reduction=2, dtype=self.dtype)(x_fd)
        sigma_pre = jnp.abs(jnp.mean(se, axis=(1, 2, 3))) + side / 2.0  # [B]
        sigma = jnp.minimum(sigma_pre, side - 10.0)

        u = jnp.arange(h, dtype=jnp.float32) - h / 2.0
        v = jnp.arange(w, dtype=jnp.float32) - w / 2.0
        d2 = u[:, None] ** 2 + v[None, :] ** 2  # [H, W]
        hp = 1.0 - jnp.exp(-d2[None, :, :] / (2.0 * sigma[:, None, None] ** 2))  # [B,H,W]
        hp = hp[..., None]  # broadcast over channels

        filtered = fft * hp.astype(jnp.complex64)
        x_fd_filtered = jnp.concatenate(
            [jnp.real(filtered), jnp.imag(filtered)], axis=-1
        ).astype(x.dtype)
        hf_atten = ResSE(reduction=2, dtype=self.dtype)(x_fd_filtered)
        lf_map = nn.Conv(
            self.out_channels, (1, 1), kernel_init=default_kernel_init, dtype=self.dtype
        )(hf_atten)
        x_lf_feature = cnn_x * lf_map
        x_hf_feature = jnp.abs(jnp.fft.ifftn(filtered, axes=(1, 2))).astype(x.dtype)

        return jnp.concatenate([xn, cnn_x, denoise_x, x_lf_feature, x_hf_feature], axis=-1)
