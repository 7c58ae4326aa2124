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

TPU-first: every frequency-domain feature (FFT -> SE-gated Gaussian
high-pass -> |IFFT| map and the low-freq attention map) depends ONLY on the
condition channels, which are constant across the reverse-diffusion scan —
the reference recomputes them on each of the T UNet calls
(resdiff_diffusion.py denoising loop). `cond_features` exposes that
invariant slice so the sampler hoists it out of the scan (factory.
generate_sr), leaving only the noise-level-dependent suppression branch
per step. Submodule names are pinned to the historical auto-generated
names so checkpoints and torch_convert remain compatible.
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
    def __call__(
        self,
        x: jnp.ndarray,
        noise_embed: Optional[jnp.ndarray] = None,
        *,
        cond_feats: Optional[tuple] = None,
        cond_only: bool = False,
    ) -> jnp.ndarray:
        """Build the 5C conditioning stack (or just its invariant slice).

        cond_only=True: `x` is the bare condition image [B,H,W,C]; returns
        the scan-invariant `(x_lf_feature, x_hf_feature)` pair.
        cond_feats: precomputed pair from a cond_only call — skips the
        frequency-domain recompute inside a sampling scan.
        """
        c = self.image_channels
        if cond_only:
            return self._cond_features(x)
        cnn_x = x[..., :c]
        xn = x[..., c:]
        b, h, w, _ = x.shape

        # --- noise image suppression (fd_info_spliter.py:43-47) ---
        ne = nn.Dense(
            w, kernel_init=default_kernel_init, dtype=self.dtype, name="Dense_0"
        )(noise_embed)
        ne = jnp.broadcast_to(ne[:, None, :, None], (b, h, w, c)).astype(x.dtype)
        noise_atten = ResSE(
            reduction=1 if c == 1 else 2, dtype=self.dtype, name="ResSE_0"
        )(ne)
        denoise_x = xn * noise_atten

        if cond_feats is None:
            x_lf_feature, x_hf_feature = self._cond_features(cnn_x)
        else:
            x_lf_feature, x_hf_feature = cond_feats
            x_lf_feature = x_lf_feature.astype(x.dtype)
            x_hf_feature = x_hf_feature.astype(x.dtype)

        return jnp.concatenate([xn, cnn_x, denoise_x, x_lf_feature, x_hf_feature], axis=-1)

    def _cond_features(self, cnn_x: jnp.ndarray) -> tuple:
        """High/low frequency separation (fd_info_spliter.py:49-96).

        Depends only on the condition channels — constant across a sampling
        chain. Submodule names pinned (ResSE_1/ResSE_2/Conv_0) to the
        historical creation order.
        """
        _, h, w, _ = cnn_x.shape
        fft = jnp.fft.fftn(cnn_x.astype(jnp.complex64), axes=(1, 2))
        x_fd = jnp.concatenate([jnp.real(fft), jnp.imag(fft)], axis=-1).astype(
            cnn_x.dtype
        )

        side = float(min(h, w))
        se = ResSE(reduction=2, dtype=self.dtype, name="ResSE_1")(x_fd)
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
        ).astype(cnn_x.dtype)
        hf_atten = ResSE(reduction=2, dtype=self.dtype, name="ResSE_2")(x_fd_filtered)
        lf_map = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=default_kernel_init,
            dtype=self.dtype,
            name="Conv_0",
        )(hf_atten)
        x_lf_feature = cnn_x * lf_map
        x_hf_feature = jnp.abs(jnp.fft.ifftn(filtered, axes=(1, 2))).astype(cnn_x.dtype)
        return x_lf_feature, x_hf_feature
