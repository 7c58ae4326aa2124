"""Kernel <-> moment conversion (K2M / M2K) for physics-constrained kernels.

Reference: models/diffusion_models/phydiff/constrain_moments.py (PhyDNet's
moment machinery; kept by the reference though unused in the final thesis —
header note at constrain_moments.py:1-5). Re-derived here rather than
ported: the per-axis moment matrix is

    M[i, j] = (j - (l - 1)//2)^i / i!          (l = kernel size along axis)

so `k2m` contracts each kernel axis with M (moments of the kernel around
its center, scaled by 1/i!) and `m2k` contracts with inv(M). For an exact
finite-difference stencil of derivative order (a, b), the (a, b) moment is
1 and lower-order moments vanish — which is what the moment-constraint
loss pins.

Matrices are built once in float64 (numpy) and applied as jnp contractions;
the transform is separable so an N-D kernel costs N small matmuls.
"""

from __future__ import annotations

from functools import lru_cache
from math import factorial

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _moment_matrices(shape: tuple) -> tuple:
    """(M, invM) per axis, float64. M[i,j] = (j - (l-1)//2)^i / i!."""
    ms, invs = [], []
    for l in shape:
        grid = np.arange(l, dtype=np.float64) - (l - 1) // 2
        m = np.stack([grid**i / factorial(i) for i in range(l)])
        ms.append(m)
        invs.append(np.linalg.inv(m))
    return tuple(ms), tuple(invs)


def _apply_per_axis(x: jnp.ndarray, mats, ndim: int) -> jnp.ndarray:
    """Contract the trailing `ndim` axes of x with one matrix each."""
    for ax in range(ndim):
        axis = x.ndim - ndim + ax
        mat = jnp.asarray(mats[ax], x.dtype)
        x = jnp.moveaxis(jnp.tensordot(mat, x, axes=(1, axis)), 0, axis)
    return x


def k2m(kernel: jnp.ndarray, ndim: int = 2) -> jnp.ndarray:
    """Kernel -> moment matrix over the trailing `ndim` axes."""
    shape = tuple(int(s) for s in kernel.shape[-ndim:])
    ms, _ = _moment_matrices(shape)
    return _apply_per_axis(kernel, ms, ndim)


def m2k(moments: jnp.ndarray, ndim: int = 2) -> jnp.ndarray:
    """Moment matrix -> kernel over the trailing `ndim` axes."""
    shape = tuple(int(s) for s in moments.shape[-ndim:])
    _, invs = _moment_matrices(shape)
    return _apply_per_axis(moments, invs, ndim)


def moment_constraint_loss(kernels: jnp.ndarray, target_moments: jnp.ndarray) -> jnp.ndarray:
    """MSE between kernel moments and target derivative moments.

    The reference computes this loss but leaves it commented out
    (phydiff_diffusion.py:130-138); exposed here as an opt-in regularizer.
    """
    return jnp.mean(jnp.square(k2m(kernels) - target_moments))
