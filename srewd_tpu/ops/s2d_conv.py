"""Exact space-to-depth (along W) rewrite of 3x3 SAME convs at small C.

Profiling the sr3 sampling chain (scripts/profile_sampling.py, DESIGN §1)
showed the full-res C=64 convs running at 26% of MXU peak while every
C>=128 conv runs at 94-96%: with 64 output channels only half of the
128-wide MXU output tile is used. This module computes the SAME 3x3 conv
in a W-paired layout where both channel axes are doubled:

  NHWC puts C minor and W next, so merging (W-pair, C) -> 2C is a FREE
  reshape: [B, H, W, C] -> [B, H, W/2, 2C]. A 3x3 stride-1 SAME conv on
  the original becomes a 3x3 SAME conv on the paired layout with a
  transformed kernel W'[ki, m, (dj_in, c), (dj_out, o)] =
  W[ki, 2m + dj_in - dj_out, c, o] (zero where the index leaves [0, 3)):
  for each output phase dj_out, 3 of the 6 (m, dj_in) input-tap slots are
  nonzero, so the rewrite spends 2x the MACs — but at the C=128 MXU
  efficiency, which the profile measured at ~3.7x the C=64 efficiency.
  Measured on v5e: see the "s2d" row of scripts/profile_sampling.py.

Zero padding composes exactly: the paired conv's SAME padding introduces
phantom taps only at original positions j=-2 and j=W+1, whose transformed
kernel entries are structurally zero.

Requires stride 1, 3x3 kernel, even W. The kernel transform is
differentiable (pure gather/scatter of the [3,3,C,O] tensor), so the op is
safe on training paths; under a sampling scan the transform is
loop-invariant and XLA hoists it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# paired-tap index table: entry [m, dj_in, dj_out] selects original kj
# = 2(m-1) + dj_in - dj_out + 1, remapped into a kj-axis zero-padded by 2
# on each side (out-of-range taps land on structural zeros). Built once.
_TAP_IDX = np.array(
    [[[2 * (m - 1) + a - b + 1 + 2 for b in range(2)] for a in range(2)]
     for m in range(3)], np.int32)  # [3 (m), 2 (dj_in), 2 (dj_out)]


def s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] SAME-conv kernel -> [3, 3, 2C, 2O] W-paired kernel.

    Implemented as pad + static gather + transpose + reshape (pure data
    movement, no scatters) so that when the transform is traced inside a
    sampling scan with the weights as loop-invariant inputs, XLA's
    while-loop LICM can hoist it out of the chain."""
    kh, kw, c, o = kernel.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s2d rewrite is for 3x3 kernels, got {(kh, kw)}")
    kp = jnp.pad(kernel, ((0, 0), (2, 2), (0, 0), (0, 0)))  # kj-axis -> 7
    g = jnp.take(kp, jnp.asarray(_TAP_IDX.reshape(-1)), axis=1)
    g = g.reshape(3, 3, 2, 2, c, o)            # [ki, m, dj_in, dj_out, c, o]
    g = g.transpose(0, 1, 2, 4, 3, 5)          # [ki, m, dj_in, c, dj_out, o]
    return g.reshape(3, 3, 2 * c, 2 * o)


def conv3x3_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv of NHWC `x` with `kernel` [3,3,C,O], computed
    in the W-paired layout. Exact (up to dot-product summation order)."""
    import jax

    b, h, w, c = x.shape
    if w % 2:
        raise ValueError(f"even W required, got {w}")
    o = kernel.shape[-1]
    xp = x.reshape(b, h, w // 2, 2 * c)
    kp = s2d_kernel(kernel)
    yp = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    y = yp.astype(x.dtype).reshape(b, h, w, o)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def s2d_profitable(c_in: int, c_out: int) -> bool:
    """The rewrite pays when the output tile underfills the 128-wide MXU:
    measured 26% -> ~50%+ of peak at c_out=64 (2x MACs, ~3.7x efficiency).
    At c_out >= 128 the direct conv already runs at 94-96%."""
    return c_out <= 64 and c_in <= 128
