"""Fixed finite-difference physics stencils of the PhyDiff architectures.

The reference augments the PhyDiff UNet input with three fixed 3x3 stencil
responses of the (reflect-padded) condition image — forward differences
d/dx, d/dy and the 5-point Laplacian — each summed over input channels to a
single map (reference: models/diffusion_models/phydiff/unet.py:189-196 and
:311-314; same kernels in physrdiff/unet.py:52-59).

TPU-first design: a 3x3 stencil with +-1 coefficients is cheaper as shifted
slices of the reflect-padded array than as a convolution; XLA fuses the adds
into the consumer. Exact parity with torch's F.conv2d over F.pad(reflect).
"""

from __future__ import annotations

import jax.numpy as jnp


def fd_stencils(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,W,3]: (d/dx, d/dy, laplacian), summed over channels.

    Matches torch kernels (with rows = y axis, cols = x axis):
      kernel_x  = [[0,0,0],[0,-1,1],[0,0,0]]  (right neighbour - center)
      kernel_y  = [[0,0,0],[0,-1,0],[0,1,0]]  (down  neighbour - center)
      kernel_xy = [[0,1,0],[1,-4,1],[0,1,0]]  (Laplacian)
    applied after reflect padding of 1.
    """
    xs = jnp.sum(x.astype(jnp.float32), axis=-1)  # [B,H,W]
    p = jnp.pad(xs, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    center = p[:, 1:-1, 1:-1]
    right = p[:, 1:-1, 2:]
    left = p[:, 1:-1, :-2]
    down = p[:, 2:, 1:-1]
    up = p[:, :-2, 1:-1]
    ddx = right - center
    ddy = down - center
    lap = up + down + left + right - 4.0 * center
    return jnp.stack([ddx, ddy, lap], axis=-1).astype(x.dtype)
