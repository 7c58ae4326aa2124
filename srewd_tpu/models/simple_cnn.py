"""SimpleCNN — the 3-conv + PixelShuffle(4) SR encoder used by ResDiff.

Reference: models/simple_cnn/Simple_CNN.py. out = pixelshuffle(convs(x)) +
bicubic_up4(x). NHWC; the pixel shuffle is a reshape/transpose matching
torch's channel ordering (c*r^2 + i*r + j).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import bicubic_up4
from .blocks import default_kernel_init


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch semantics: [B,H,W,C*r^2] -> [B,H*r,W*r,C]."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B,H,r,W,r,C]
    return x.reshape(b, h * r, w * r, c)


class SimpleCNN(nn.Module):
    scale_factor: int = 4
    channels: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_up = bicubic_up4(x) if self.scale_factor == 4 else None
        if x_up is None:
            from ..ops.resize import resize2d

            _, h, w, _ = x.shape
            x_up = resize2d(x, (h * self.scale_factor, w * self.scale_factor), "bicubic")
        h = nn.Conv(64, (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype)(x)
        h = jax.nn.relu(h)
        h = nn.Conv(32, (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(
            self.channels * self.scale_factor**2,
            (3, 3),
            padding=1,
            kernel_init=default_kernel_init,
            dtype=self.dtype,
        )(h)
        return pixel_shuffle(h, self.scale_factor) + x_up
