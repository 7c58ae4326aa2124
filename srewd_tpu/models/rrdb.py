"""RRDBNet — Residual-in-Residual Dense Block SR network (SRDiff encoder).

Reference: models/rrdb_encoder/RRDBNet.py. Input remapped [-1,1] -> [0,1] at
entry and back (with clamp) at exit; `get_fea=True` additionally returns the
per-block feature list consumed by the SRDiff UNet conditioning
(srdiff_diffusion.py:179, srdiff/unet.py:118).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample_nearest2x
from .blocks import default_kernel_init


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda n: nn.Conv(  # noqa: E731
            n, (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype
        )
        x1 = _lrelu(conv(self.gc)(x))
        x2 = _lrelu(conv(self.gc)(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(self.gc)(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(self.gc)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    in_nc: int = 1
    out_nc: int = 1
    nf: int = 64
    nb: int = 17
    gc: int = 32
    dtype: Optional[Any] = None
    # Reference parity (RRDBNet.py): clamp the SR output to the [0,1]
    # internal range before remapping back to [-1,1]. Correct for
    # [-1,1]-ranged image data; on standard-scaled (sigma-unit) weather
    # fields it makes every target beyond +-1 sigma unreachable AND zeroes
    # the gradient for any pixel whose pre-clip output starts outside
    # [0,1] (at init that is ~half of them: the output freezes near the
    # constant -1 and L1 loss plateaus at E|HR+1| ~= 1.15). The reference
    # carries this latent defect on its own sigma-scaled data; the
    # training paths here disable it (pretrainer.py, factory.py).
    clamp_output: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_fea: bool = False):
        conv = lambda n: nn.Conv(  # noqa: E731
            n, (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype
        )
        feas = []
        x = (x + 1.0) / 2.0
        fea_first = fea = conv(self.nf)(x)
        for _ in range(self.nb):
            fea = RRDB(self.nf, self.gc, dtype=self.dtype)(fea)
            feas.append(fea)
        trunk = conv(self.nf)(fea)
        fea = fea_first + trunk
        feas.append(fea)

        fea = _lrelu(conv(self.nf)(upsample_nearest2x(fea)))
        fea = _lrelu(conv(self.nf)(upsample_nearest2x(fea)))
        fea_hr = conv(self.nf)(fea)
        out = conv(self.out_nc)(_lrelu(fea_hr))
        if self.clamp_output:
            out = jnp.clip(out, 0.0, 1.0)
        out = out * 2.0 - 1.0
        if get_fea:
            return out, feas
        return out
