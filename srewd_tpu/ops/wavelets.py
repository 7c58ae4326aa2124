"""Orthonormal 2-D Haar DWT as reshape + adds (no convolution, no gather).

The reference uses `pytorch_wavelets.DWTForward(J=4, wave='haar',
mode='symmetric')` to build the high-frequency query pyramids of the
ResDiff / PhyDiff / PhySRDiff UNets (reference:
models/diffusion_models/resdiff/unet.py:128-132,
phydiff/unet.py:265-276, physrdiff/unet.py:144-148) and the DWT term of the
SimpleCNN pretraining loss (models/simple_cnn/loss.py:30-56) — and
re-constructs the transform module *on every forward pass, on CUDA*.

TPU-first design: for the Haar wavelet (filter length 2) on even-sized
inputs, symmetric boundary handling is a no-op and each level is exactly a
2x2 block transform, so the whole DWT is a reshape plus four adds — pure VPU
work that XLA fuses with its consumers. Subband convention follows pywt:
  low  = (x0 + x1) / sqrt(2)        high = (x0 - x1) / sqrt(2)
  returns (LL, (H, V, D)) with
  H (horizontal detail) = rows-high x cols-low,
  V (vertical detail)   = rows-low  x cols-high,
  D (diagonal)          = rows-high x cols-high.
Any global sign flip relative to pytorch_wavelets is absorbed by the learned
1x1 query projections downstream.
"""

from __future__ import annotations

import jax.numpy as jnp


def haar_dwt2d(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Single-level 2-D Haar DWT of NHWC input with even H and W.

    Returns (ll, (h, v, d)), each [B, H/2, W/2, C].
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"haar_dwt2d requires even spatial dims, got {(h, w)}")
    blocks = x.reshape(b, h // 2, 2, w // 2, 2, c)
    a = blocks[:, :, 0, :, 0, :]
    bb = blocks[:, :, 0, :, 1, :]
    cc = blocks[:, :, 1, :, 0, :]
    d = blocks[:, :, 1, :, 1, :]
    ll = (a + bb + cc + d) * 0.5
    hh = (a + bb - cc - d) * 0.5  # horizontal detail (high along rows)
    vv = (a - bb + cc - d) * 0.5  # vertical detail (high along cols)
    dd = (a - bb - cc + d) * 0.5  # diagonal detail
    return ll, (hh, vv, dd)


def haar_dwt_pyramid(
    x: jnp.ndarray, levels: int = 4, combine: str = "sum"
) -> list[jnp.ndarray]:
    """J-level high-frequency pyramid used as HF_guided_CA queries.

    combine="sum"    — H+V+D per level, [B, H/2^j, W/2^j, C]
                       (resdiff/unet.py:132, physrdiff/unet.py:148)
    combine="concat" — channel-concat [H, V, D], [B, ., ., 3C]
                       (phydiff/unet.py:274-276)
    combine="none"   — list of (H, V, D) tuples (simple_cnn/loss.py:46-53)
    """
    out = []
    ll = x
    for _ in range(levels):
        ll, (hh, vv, dd) = haar_dwt2d(ll)
        if combine == "sum":
            out.append(hh + vv + dd)
        elif combine == "concat":
            out.append(jnp.concatenate([hh, vv, dd], axis=-1))
        elif combine == "none":
            out.append((hh, vv, dd))
        else:
            raise ValueError(f"unknown combine: {combine}")
    return out


def haar_idwt2d(
    ll: jnp.ndarray, highs: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
) -> jnp.ndarray:
    """Inverse of haar_dwt2d (exact reconstruction)."""
    hh, vv, dd = highs
    a = (ll + hh + vv + dd) * 0.5
    bb = (ll + hh - vv - dd) * 0.5
    cc = (ll - hh + vv - dd) * 0.5
    d = (ll - hh - vv + dd) * 0.5
    b, h2, w2, c = ll.shape
    blocks = jnp.stack(
        [jnp.stack([a, bb], axis=3), jnp.stack([cc, d], axis=3)], axis=2
    )  # [B, H/2, 2, W/2, 2, C]
    return blocks.reshape(b, h2 * 2, w2 * 2, c)
