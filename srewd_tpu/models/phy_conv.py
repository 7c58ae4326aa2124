"""PhyConv — physically-interpretable learnable stencil bank.

Reference: models/diffusion_models/phydiff/unet.py:11-137 (PhyConv; kept by
the reference but unused in the final thesis, constrain_moments.py:1-5).
Learnable k x k kernels are applied (reflect padding) to a bilinear x0.5
pyramid of the clean condition channels; the coarsest response is projected
to 1 channel, and the kernels' moment matrices (K2M) are returned so a
moment-constraint loss can pin each kernel to a target derivative order
(ops/moments.moment_constraint_loss — the loss the reference comments out
at phydiff_diffusion.py:130-138).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.moments import k2m
from ..ops.resize import resize2d
from .blocks import default_kernel_init


class PhyConv(nn.Module):
    n_filters: int = 3
    kernel_size: int = 5
    in_channels: int = 1
    levels: int = 4  # J downsampling stages (phydiff/unet.py:24)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x [B,H,W,C>=in_channels] (condition first, reference splits off the
        noisy half, unet.py:44). Returns (coarsest 1ch response, moments)."""
        k = self.kernel_size
        kernels = self.param(
            "kernels",
            nn.initializers.normal(stddev=0.02),
            (self.n_filters, k, k),
            jnp.float32,
        )
        img = x[..., : self.in_channels]

        # [k,k,Cin,Cin*n_filters] depthwise-expanded filter bank
        rhs = jnp.transpose(kernels, (1, 2, 0))[:, :, None, :]
        rhs = jnp.tile(rhs, (1, 1, self.in_channels, 1)).astype(img.dtype)

        def stencil_conv(y):
            p = (k - 1) // 2
            y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
            return jax.lax.conv_general_dilated(
                y, rhs, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.in_channels,
            )

        # only the coarsest pyramid response is consumed (the reference also
        # discards the finer levels, phydiff/unet.py:47-55 — its full-res
        # conv is dead compute we skip)
        for _ in range(self.levels):
            img = resize2d(img, (img.shape[1] // 2, img.shape[2] // 2), "bilinear")
        out = stencil_conv(img)
        out = nn.Conv(1, (1, 1), kernel_init=default_kernel_init, dtype=self.dtype)(out)
        return out, k2m(kernels)
