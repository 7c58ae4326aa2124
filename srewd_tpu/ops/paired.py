"""W-paired execution of the full-resolution UNet level.

DESIGN §1 measured the full-res C=64 convs at 26% of MXU peak (64 of 128
output lanes used) and the isolated space-to-depth rewrite (ops/s2d_conv)
1.29x faster — but the per-conv rewrite REGRESSED end-to-end because every
op between two s2d convs forced a tiled-layout relayout of the 33 MB
activation (pair before, unpair after). The fix recorded there as "left on
the table" is implemented here: the ENTIRE full-resolution level executes
in the paired layout

    [B, H, W, C]  -(one reshape at level entry)->  [B, H, W/2, 2C]

with every intermediate op paired-native, so the only relayouts are one
pair() at level entry and one unpair() at level exit:

  * 3x3 stride-1 SAME convs run with the s2d-transformed kernel
    (ops/s2d_conv.s2d_kernel): 2x the MACs at the measured ~3.7x per-MAC
    efficiency of full 128-lane tiles;
  * 1x1 convs become feature_group_count=2 convs with the kernel applied
    per phase — exactly 1x the MACs, no waste;
  * GroupNorm folds the two phases of each channel into one statistic on a
    [B, 2C] reduction (big-tensor traffic identical to the unpaired GN);
  * per-channel broadcasts (GN affine, FeatureWiseAffine noise injection,
    conv bias) tile channel vectors to (phase, channel) order;
  * skip concatenation re-canonicalizes to phase-major channel order
    inside the concat copy it performs anyway.

Channel convention: paired channel index d = phase * C + c, i.e. the first
C channels are the even-W columns, the next C the odd — exactly what the
row-major NHWC reshape produces, kept phase-major across concats.

The paired level is exact (same dot products, f32 accumulation; only the
summation order differs) and fully differentiable — the kernel transforms
are pure gathers/concats, so autodiff produces gradients w.r.t. the
ORIGINAL [3,3,C,O] parameters and the checkpoint tree is unchanged.

Routing lives in models/blocks.py (`paired_region`) + models/unet.py;
SREWD_PAIRED_LEVEL gates it (see blocks.py for the measured default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .s2d_conv import s2d_kernel


def pair(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W/2, 2C] (phase-major channels). One relayout."""
    b, h, w, c = x.shape
    if w % 2:
        raise ValueError(f"even W required, got {w}")
    # row-major NHWC flattening of (w-pair, phase, c) puts d = phase*C + c:
    # the plain reshape IS phase-major (matches ops/s2d_conv's kernel layout)
    return x.reshape(b, h, w // 2, 2 * c)


def unpair(xp: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W/2, 2C] -> [B, H, W, C]. One relayout."""
    b, h, w2, c2 = xp.shape
    if c2 % 2:
        raise ValueError(f"even channel count required, got {c2}")
    return xp.reshape(b, h, w2 * 2, c2 // 2)


def paired_concat(*tensors: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat paired tensors, re-canonicalizing to phase-major.

    concat([a, b]) of paired tensors would yield [a_even, a_odd, b_even,
    b_odd]; downstream paired ops need [a_even, b_even, a_odd, b_odd].
    The reorder rides the copy the concat performs anyway.
    """
    evens = [t[..., : t.shape[-1] // 2] for t in tensors]
    odds = [t[..., t.shape[-1] // 2:] for t in tensors]
    return jnp.concatenate(evens + odds, axis=-1)


def tile_channel_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector [..., C] -> paired [..., 2C] (same value per phase)."""
    return jnp.concatenate([v, v], axis=-1)


def conv3x3_paired(
    xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv on the PAIRED tensor with the ORIGINAL kernel.

    xp [B, H, W/2, 2C]; kernel [3, 3, C, O]; output stays paired
    [B, H, W/2, 2O]. The s2d kernel transform is pure data movement of the
    [3,3,C,O] weights — loop-invariant inside a sampling scan, hoisted by
    XLA LICM (measured in scripts/profile_s2d_chain.py).
    """
    kp = s2d_kernel(kernel)
    yp = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if xp.dtype == jnp.float32 else None,
    ).astype(xp.dtype)
    if bias is not None:
        yp = yp + tile_channel_vector(bias).astype(yp.dtype)
    return yp


def conv1x1_paired(
    xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """1x1 conv on the paired tensor — feature_group_count=2, exactly 1x MACs.

    Group g (phase g) consumes input channels [gC, (g+1)C) and produces
    output channels [gO, (g+1)O) with the SAME [1,1,C,O] kernel: output
    stays phase-major paired.
    """
    kp = jnp.concatenate([kernel, kernel], axis=-1)  # [1,1,C,2O]
    yp = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
        preferred_element_type=jnp.float32 if xp.dtype == jnp.float32 else None,
    ).astype(xp.dtype)
    if bias is not None:
        yp = yp + tile_channel_vector(bias).astype(yp.dtype)
    return yp


def paired_gn_swish(
    xp: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    apply_swish: bool,
) -> jnp.ndarray:
    """GroupNorm + affine (+Swish) on the paired tensor.

    Matches ops/pallas_fused._pure_gn_swish semantics (f32 stats via
    E[x^2]-E[x]^2, affine in f32, cast to storage dtype BEFORE the swish).
    Each group's statistics pool BOTH phases of its channels — i.e. exactly
    the unpaired GroupNorm statistics. Big-tensor traffic: two reductions
    and one FMA over xp, the same bytes as the unpaired path; the phase and
    group folds happen on [B, 2C] scalars.
    """
    b, h, w2, c2 = xp.shape
    c = c2 // 2
    cg = c // num_groups
    x32 = xp.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=(1, 2))               # [B, 2C]
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2))   # [B, 2C]
    m1 = 0.5 * (m1[:, :c] + m1[:, c:])
    m2 = 0.5 * (m2[:, :c] + m2[:, c:])
    mean_g = m1.reshape(b, num_groups, cg).mean(-1)   # [B, G]
    var_g = m2.reshape(b, num_groups, cg).mean(-1) - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    a = scale.astype(jnp.float32)[None, :] * jnp.repeat(inv_g, cg, axis=-1)
    off = bias.astype(jnp.float32)[None, :] - jnp.repeat(mean_g, cg, axis=-1) * a
    a2 = tile_channel_vector(a)[:, None, None, :]
    off2 = tile_channel_vector(off)[:, None, None, :]
    y = (x32 * a2 + off2).astype(xp.dtype)
    if apply_swish:
        y = y * jax.nn.sigmoid(y)
    return y
